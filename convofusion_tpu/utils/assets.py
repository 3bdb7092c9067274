"""Asset-drop contract for real released artifacts.

This environment ships none of the released artifacts the reference's
end-to-end fidelity claims rest on: the ``t5-base`` tokenizer/weights
(reference t5.py:28), the released reference checkpoints
(reference README.md:50-57), and the FID feature net
``experiments/eval/last_499.bin`` (reference metric_eval.py:445).  Every
parity claim needing them is therefore conditional (BASELINE.md).  This
module fixes ONE documented drop-in location so that, the moment the
files appear, the skipped validations auto-activate — no code changes,
no flags.

Layout (root defaults to ``<repo>/assets``; override with the
``CONVOFUSION_TPU_ASSETS`` env var)::

    assets/
      t5-base/spiece.model          # tokenizer model (HF repo t5-base)
      t5-base/config.json           # + encoder weights: pytorch_model.bin
      t5-base/pytorch_model.bin     #   or model.safetensors
      eval/last_499.bin             # FID feature net (ref README.md:57)
      checkpoints/*.ckpt            # released reference checkpoints

What activates on drop:
  * ``t5-base/spiece.model`` -> ``find_spiece``/``make_tokenizer`` use it
    (exact t5-base ids) and ``tests/test_tokenizer.py`` parity tests run.
  * ``t5-base/`` weights -> ``tests/test_tokenizer.py::
    test_t5_base_weight_parity_if_assets`` compares the native JAX T5
    trunk against transformers over real weights.
  * ``eval/last_499.bin`` -> ``eval/fid_net.py`` loads the released FID
    features (paper-comparable FID instead of the random-feature proxy).
  * ``checkpoints/*.ckpt`` -> ``compat/convert.py`` / cli/test.py consume
    them directly (torch state-dict loader).

Integrity: hashes are recorded at drop time, not invented here —
``--freeze`` writes ``MANIFEST.json`` (sha256 per file) and ``--verify``
checks the tree against it, so a re-provisioned environment can prove
the assets are the same bytes that produced any recorded numbers.

CLI::

    python -m convofusion_tpu.utils.assets            # status table
    python -m convofusion_tpu.utils.assets --freeze   # write MANIFEST.json
    python -m convofusion_tpu.utils.assets --verify   # check MANIFEST.json
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional

ENV_VAR = "CONVOFUSION_TPU_ASSETS"

# tracked asset slots: relpath -> what auto-activates when present
SLOTS = {
    "t5-base/spiece.model": "exact t5-base tokenization + parity tests",
    "t5-base/pytorch_model.bin": "native-T5 weight parity vs transformers",
    "t5-base/model.safetensors": "native-T5 weight parity (alt format)",
    "eval/last_499.bin": "released FID feature net (paper-comparable FID)",
}


def assets_root() -> str:
    env = os.environ.get(ENV_VAR)
    if env:
        return env
    # <repo>/assets — utils/ is two levels below the package root's parent
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), "assets")


def asset_path(rel: str) -> Optional[str]:
    """Absolute path of a dropped asset, or None if absent."""
    p = os.path.join(assets_root(), rel)
    return p if os.path.isfile(p) else None


def sha256(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _walk(root: str):
    for dirpath, _, files in os.walk(root):
        for fname in sorted(files):
            if fname == "MANIFEST.json":
                continue
            full = os.path.join(dirpath, fname)
            yield os.path.relpath(full, root).replace(os.sep, "/"), full


def freeze(root: Optional[str] = None) -> Dict[str, Dict]:
    """Record sha256 + size for every file under the assets root."""
    root = root or assets_root()
    manifest = {
        rel: {"sha256": sha256(full), "bytes": os.path.getsize(full)}
        for rel, full in _walk(root)
    }
    with open(os.path.join(root, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def verify(root: Optional[str] = None) -> Dict[str, str]:
    """Check the tree against MANIFEST.json.

    Returns {relpath: 'ok' | 'missing' | 'changed' | 'untracked'};
    raises FileNotFoundError if no manifest was frozen."""
    root = root or assets_root()
    mpath = os.path.join(root, "MANIFEST.json")
    with open(mpath) as f:
        manifest = json.load(f)
    present = dict(_walk(root))
    out = {}
    for rel, rec in manifest.items():
        full = present.pop(rel, None)
        if full is None:
            out[rel] = "missing"
        elif sha256(full) != rec["sha256"]:
            out[rel] = "changed"
        else:
            out[rel] = "ok"
    for rel in present:
        out[rel] = "untracked"
    return out


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--freeze", action="store_true",
                    help="write MANIFEST.json (sha256 of every file)")
    ap.add_argument("--verify", action="store_true",
                    help="check files against MANIFEST.json")
    args = ap.parse_args(argv)

    root = assets_root()
    print(f"assets root: {root} "
          f"({'exists' if os.path.isdir(root) else 'ABSENT'})")
    if args.freeze:
        m = freeze(root)
        print(f"froze {len(m)} files into MANIFEST.json")
        return 0
    if args.verify:
        try:
            res = verify(root)
        except FileNotFoundError:
            print("no MANIFEST.json — run --freeze after dropping assets")
            return 2
        bad = {k: v for k, v in res.items() if v not in ("ok",)}
        for rel, state in sorted(res.items()):
            print(f"  {state:>9}  {rel}")
        return 1 if any(v in ("missing", "changed") for v in bad.values()) \
            else 0
    for rel, activates in SLOTS.items():
        state = "present" if asset_path(rel) else "absent"
        print(f"  {state:>8}  {rel}  ->  {activates}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
