"""A minimal headless tkinter stand-in for GUI tests.

No display exists in this image, so ``tk.Tk()`` always raises and the real
GUI tests skip. This module implements exactly the widget surface
``apps/gui`` uses (Frame/Label/Button/Scale/Menu/Canvas/variables,
``after`` run synchronously, filedialog/messagebox recorders) so the whole
app layer — click handling, rendering draw-ops, button state machine,
threaded AI marshalling — executes for real in tests
(``tests/test_gui_headless.py``), mirroring the reference's GUI automation
intent (``/root/reference/test_gui_automated.py``).
"""

import types


class TclError(Exception):
    pass


class Event:
    def __init__(self, x=0, y=0):
        self.x = x
        self.y = y


class _Var:
    def __init__(self, master=None, value=None, name=None):
        self._value = value

    def get(self):
        return self._value

    def set(self, value):
        self._value = value


class StringVar(_Var):
    def __init__(self, master=None, value="", name=None):
        super().__init__(master, value, name)


class IntVar(_Var):
    def __init__(self, master=None, value=0, name=None):
        super().__init__(master, int(value), name)

    def get(self):
        return int(self._value)


class DoubleVar(_Var):
    def __init__(self, master=None, value=0.0, name=None):
        super().__init__(master, float(value), name)


class Widget:
    def __init__(self, master=None, **kw):
        self.master = master
        self.kw = dict(kw)
        self._bindings = {}
        self._exists = True
        self.children = []
        if master is not None and hasattr(master, "children"):
            master.children.append(self)

    # geometry managers are no-ops headlessly
    def pack(self, **kw):
        return self

    def grid(self, **kw):
        return self

    def place(self, **kw):
        return self

    def config(self, **kw):
        self.kw.update(kw)

    configure = config

    def cget(self, key):
        return self.kw.get(key)

    __getitem__ = cget

    def bind(self, sequence, func=None, add=None):
        self._bindings[sequence] = func

    def event_generate(self, sequence, **kw):
        fn = self._bindings.get(sequence)
        if fn is not None:
            fn(Event(**kw))

    def destroy(self):
        self._exists = False
        for c in self.children:
            c.destroy()

    def winfo_exists(self):
        return self._exists

    def after(self, ms, func=None, *args):
        # synchronous: callbacks run immediately (tests join worker threads
        # before asserting, so ordering matches the real event loop closely
        # enough for state assertions)
        if func is not None:
            func(*args)
        return f"after#{id(func)}"

    def after_cancel(self, ident):
        pass

    def update(self):
        pass

    def update_idletasks(self):
        pass


class Tk(Widget):
    def __init__(self, screenName=None, **kw):
        super().__init__(None, **kw)
        self._title = ""

    def title(self, text=None):
        if text is not None:
            self._title = text
        return self._title

    def withdraw(self):
        pass

    def deiconify(self):
        pass

    def protocol(self, name=None, func=None):
        pass

    def geometry(self, spec=None):
        pass

    def resizable(self, w=None, h=None):
        pass

    def mainloop(self, n=0):
        pass


class Frame(Widget):
    pass


class Label(Widget):
    pass


class Button(Widget):
    def invoke(self):
        cmd = self.kw.get("command")
        if cmd is not None and self.kw.get("state", "normal") != "disabled":
            return cmd()


class Scale(Widget):
    def set(self, value):
        var = self.kw.get("variable")
        if var is not None:
            var.set(value)
        cmd = self.kw.get("command")
        if cmd is not None:
            cmd(value)


class Menu(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self.entries = []

    def add_command(self, **kw):
        self.entries.append(("command", kw))

    def add_separator(self, **kw):
        self.entries.append(("separator", kw))

    def add_cascade(self, **kw):
        self.entries.append(("cascade", kw))


class Canvas(Widget):
    """Records draw calls as (kind, coords, options) — tests assert on the
    draw-op list instead of pixels."""

    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self.items = []
        self._next_id = 1

    def _add(self, kind, args, kw):
        self.items.append((kind, args, kw))
        ident = self._next_id
        self._next_id += 1
        return ident

    def create_line(self, *args, **kw):
        return self._add("line", args, kw)

    def create_oval(self, *args, **kw):
        return self._add("oval", args, kw)

    def create_rectangle(self, *args, **kw):
        return self._add("rectangle", args, kw)

    def create_text(self, *args, **kw):
        return self._add("text", args, kw)

    def delete(self, *tags):
        self.items.clear()

    def find_all(self):
        return tuple(range(1, len(self.items) + 1))


# -- submodules -------------------------------------------------------------

filedialog = types.ModuleType("tkinter.filedialog")
filedialog.calls = []
filedialog.return_value = ""


def _askdirectory(**kw):
    filedialog.calls.append(("askdirectory", kw))
    return filedialog.return_value


filedialog.askdirectory = _askdirectory
filedialog.askopenfilename = _askdirectory

messagebox = types.ModuleType("tkinter.messagebox")
messagebox.calls = []
for _name in ("showerror", "showinfo", "showwarning", "askyesno"):
    def _mk(name):
        def fn(*a, **kw):
            messagebox.calls.append((name, a, kw))
            return True
        return fn
    setattr(messagebox, _name, _mk(_name))
