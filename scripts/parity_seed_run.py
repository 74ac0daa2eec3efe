"""Train ONE additional parity seed on BOTH systems at the matched
4x32/40-iteration regime of the reference-parity study
(``results/reference_parity.md``):

- the reference itself, unmodified, via the ``refbuild/`` out-of-tree copy
  (its own ``main.py train`` — ``/root/reference/main.py:75-162``), on CPU;
- this repo via its own CLI, same hyperparameters key for key, on CPU.

Usage:
    python scripts/parity_seed_run.py SEED [--skip-reference] [--skip-repo]

Writes checkpoints to ``refbuild/data/models/parity_seed{SEED}/`` and
``data/models/parity_seed{SEED}_repo/``; evaluate them afterwards with
``python scripts/reference_parity.py --seeds SEED ...``. Configs are
generated from the committed seed-42 templates
(``scripts/refbuild_configs/parity_seed42.yaml``, ``configs/parity_4x32.yaml``)
with only the seed and output paths substituted.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


def gen_config(template: Path, seed: int, tag_from: str, tag_to: str,
               out: Path) -> Path:
    text = template.read_text()
    text = text.replace("seed: 42", f"seed: {seed}")
    text = text.replace(tag_from, tag_to)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(text)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("seed", type=int)
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--skip-repo", action="store_true")
    args = ap.parse_args()
    seed = args.seed

    env = dict(os.environ)
    env.setdefault("OMP_NUM_THREADS", "4")
    env["JAX_PLATFORMS"] = "cpu"

    if not args.skip_reference:
        import setup_refbuild

        refbuild = setup_refbuild.build()
        cfg = gen_config(
            REPO / "scripts" / "refbuild_configs" / "parity_seed42.yaml",
            seed, "parity_seed42", f"parity_seed{seed}",
            refbuild / "configs" / f"parity_seed{seed}.yaml",
        )
        t0 = time.time()
        print(f"[reference seed {seed}] training 40 iterations on CPU...",
              flush=True)
        subprocess.run(
            [sys.executable, "run_train.py", "train",
             "--config", str(cfg.relative_to(refbuild))],
            cwd=refbuild, env=env, check=True,
        )
        print(f"[reference seed {seed}] done in {time.time() - t0:.0f}s",
              flush=True)

    if not args.skip_repo:
        cfg = gen_config(
            REPO / "configs" / "parity_4x32.yaml",
            seed, "parity_seed42_repo", f"parity_seed{seed}_repo",
            REPO / "data" / "configs" / f"parity_seed{seed}_repo.yaml",
        )
        t0 = time.time()
        print(f"[repo seed {seed}] training 40 iterations on CPU...",
              flush=True)
        subprocess.run(
            [sys.executable, "main.py", "train", "--config", str(cfg)],
            cwd=REPO, env=env, check=True,
        )
        print(f"[repo seed {seed}] done in {time.time() - t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
