"""Build an out-of-tree, runnable copy of the reference system.

The reference at ``/root/reference`` is read-only and its Cython extension
(``src/cython/bitboard.c``, pre-generated — reference ``setup.py:11-31``) is
not compiled there. This script materializes ``<repo>/refbuild/`` as a symlink
farm over the reference sources plus a locally compiled ``bitboard`` extension
and a real ``run_train.py`` driver (Python resolves script symlinks when
computing ``sys.path[0]``, so the symlinked ``main.py`` cannot be executed
directly).

Used by:
- ``tests/test_reference_interop.py`` — loads exported checkpoints with the
  reference's own ``OthelloResNet`` / ``MCTSPlayer.from_checkpoint``;
- the measured learning-curve parity study (``results/reference_parity.md``) —
  trains the reference itself on CPU at a matched downscaled regime.

Idempotent; safe to re-run. Never writes outside the repo.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path(os.environ.get("OTHELLO_REFERENCE", "/root/reference"))
REFBUILD = REPO / "refbuild"

RUN_TRAIN = '''"""Driver for running the reference trainer out-of-tree.

The reference lives read-only at /root/reference; this refbuild/ dir holds
symlinks plus a locally-compiled bitboard extension. main.py is a symlink, and
Python resolves script symlinks when computing sys.path[0], so we need a real
entry file that pins sys.path to this directory first.
"""
import runpy
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
runpy.run_path(str(HERE / "main.py"), run_name="__main__")
'''


def _symlink(target: Path, link: Path) -> None:
    if link.is_symlink() or link.exists():
        return
    link.symlink_to(target)


def ext_suffix() -> str:
    return sysconfig.get_config_var("EXT_SUFFIX") or ".so"


def build(verbose: bool = True) -> Path:
    """Create/refresh refbuild; returns its path. Raises on compile failure."""
    if not REFERENCE.is_dir():
        raise FileNotFoundError(f"reference not found at {REFERENCE}")

    REFBUILD.mkdir(exist_ok=True)
    _symlink(REFERENCE / "main.py", REFBUILD / "main.py")
    src = REFBUILD / "src"
    src.mkdir(exist_ok=True)
    _symlink(REFERENCE / "src" / "__init__.py", src / "__init__.py")
    for pkg in ("eval", "gui", "mcts", "model", "train", "utils", "web"):
        _symlink(REFERENCE / "src" / pkg, src / pkg)

    cy = src / "cython"
    cy.mkdir(exist_ok=True)
    init = cy / "__init__.py"
    if not init.exists():
        init.write_text("")

    driver = REFBUILD / "run_train.py"
    if not driver.exists():
        driver.write_text(RUN_TRAIN)

    so = cy / f"bitboard{ext_suffix()}"
    if not so.exists():
        import numpy as np

        cmd = [
            os.environ.get("CC", "gcc"),
            "-shared", "-fPIC", "-O3",
            "-I" + sysconfig.get_path("include"),
            "-I" + np.get_include(),
            str(REFERENCE / "src" / "cython" / "bitboard.c"),
            "-o", str(so),
        ]
        if verbose:
            print("compiling reference bitboard extension:", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=not verbose)

    # import smoke test in a clean subprocess (sys.path pinned to refbuild)
    subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]); "
         "from src.cython.bitboard import OthelloBitboard; "
         "b = OthelloBitboard(); assert b.get_legal_moves() == [19, 26, 37, 44]",
         str(REFBUILD)],
        check=True,
    )
    return REFBUILD


if __name__ == "__main__":
    path = build()
    print(f"refbuild ready at {path}")
