"""Convert released reference (torch) checkpoints to orbax param trees.

Usage:
  python -m convofusion_tpu.compat.convert --ckpt epoch=989.ckpt \
      --cfg <experiment yaml> --out converted/vae_ckpt [--kind vae|full]

The converted directory loads through ``train.checkpoint.load_checkpoint``
/ ``TEST.CHECKPOINTS`` exactly like a natively trained checkpoint.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="torch .ckpt/.pt/.bin")
    ap.add_argument("--cfg", default=None,
                    help="experiment yaml (defaults to the packaged "
                         "diffusion config)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--kind", choices=["vae", "full"], default="full")
    args = ap.parse_args(argv)

    import jax

    from convofusion_tpu.config import DEFAULTS_DIR, load_config
    from convofusion_tpu.models.convofusion import Convofusion
    from convofusion_tpu.train.checkpoint import (
        load_torch_full_model,
        load_torch_vae,
        save_checkpoint,
    )

    import os

    cfg = load_config(args.cfg or os.path.join(
        DEFAULTS_DIR, "config_cf_beatdnd.yaml"))
    cfg.DATASET.NFEATS = int(cfg.DATASET.get("NFEATS", 189))
    cfg.DATASET.NJOINTS = int(cfg.DATASET.get("NJOINTS", 63))
    if args.kind == "vae":
        cfg.TRAIN.STAGE = "vae"

    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    # architecture dims are inferred from the torch state dict itself
    if args.kind == "vae":
        params["vae"] = load_torch_vae(args.ckpt)
    else:
        params = load_torch_full_model(args.ckpt, params)

    # save into a private temp dir, then move into place: writing
    # epoch=0 directly under dirname(out) could clobber a real training
    # checkpoint living there, and os.replace cannot overwrite an
    # existing non-empty orbax directory from a previous conversion
    import shutil
    import tempfile

    parent = os.path.dirname(os.path.abspath(args.out)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".convert-", dir=parent)
    try:
        path = save_checkpoint(tmp, 0, params, keep_text_model=True)
        if os.path.isdir(args.out):
            shutil.rmtree(args.out)
        os.replace(path, args.out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(f"converted {args.ckpt} ({args.kind}) -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
