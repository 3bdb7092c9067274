"""Offline evaluation driver over saved result directories.

Reference: quant_eval/metric_eval.py (monadic/BEAT: SRGR + L1div +
alignment + diversity) and quant_eval/dyadic_eval.py (DnD: FID + alignment
+ diversity + L1div), both walking ``<result_dir>/*/*/gt.npy`` sample dirs
produced by the test entry point.

Run: python -m convofusion_tpu.eval.run --result_dir ... --mode dyadic
     [--fidnet experiments/eval/last_499.bin]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import warnings

import numpy as np

from convofusion_tpu.data.audio import load_wav, normalize
from convofusion_tpu.eval.fid_net import HalfEmbeddingNet, load_torch_fidnet
from convofusion_tpu.eval.metrics import (
    Alignment,
    L1div,
    SRGR,
    calculate_avg_distance,
    calculate_jitter,
    eval_process_motion,
    frechet_distance,
)

FID_POSE_LENGTH = 128  # HalfEmbeddingNet's lin0 is hard-wired to 128 frames


def evaluate_results(result_dir: str, mode: str = "monadic",
                     fidnet_path: str | None = None,
                     max_samples: int | None = None) -> dict:
    if mode == "monadic":
        alignmenter = Alignment(sigma=0.3, order=10)
    else:
        alignmenter = Alignment(sigma=1.25, order=12)
    srgr_cal = SRGR(0.3, 63)
    l1_calculator = L1div()

    # sample names contain slashes (e.g. dnd/session/set_l1), so recurse
    # rather than the reference's fixed */*/gt.npy depth
    gt_files = sorted(glob.glob(
        os.path.join(result_dir, "**", "gt.npy"), recursive=True))
    if max_samples:
        gt_files = gt_files[:max_samples]
    if not gt_files:
        raise FileNotFoundError(f"no gt.npy under {result_dir}")

    fid_extractor = fid_params = None
    fid_random_init = False
    if not (fidnet_path and os.path.exists(fidnet_path)):
        # asset-drop contract (utils/assets.py): the released FID net
        # auto-activates when present
        from convofusion_tpu.utils.assets import asset_path

        dropped = asset_path("eval/last_499.bin")
        if dropped:
            fidnet_path = dropped
    if fidnet_path and os.path.exists(fidnet_path):
        fid_extractor = HalfEmbeddingNet(FID_POSE_LENGTH, 189, 300)
        fid_params = load_torch_fidnet(fidnet_path)
    elif mode == "dyadic":
        # FID features require the released autoencoder
        # (quant_eval/dyadic_eval.py:31-34).  Random-init features give a
        # NUMBER but not a comparable metric — mark it unmistakably so a
        # smoke run can't be mistaken for an evaluation.
        warnings.warn(
            f"FID net weights not found at {fidnet_path!r}; computing FID "
            "with a RANDOM-INIT feature extractor. The value is reported "
            "as 'fid_random_init_features' and is NOT comparable to the "
            "published metric.")
        fid_extractor = HalfEmbeddingNet(FID_POSE_LENGTH, 189, 300)
        fid_params = fid_extractor.init_params(0)
        fid_random_init = True

    align, counter = 0.0, 0
    jitters = []
    pred_all, tar_all = [], []
    missing_sem = 0
    fid_skipped = 0

    for gt_file in gt_files:
        gt = np.load(gt_file)
        pred = np.load(gt_file.replace("gt.npy", "pred.npy"))
        t = gt.shape[0]
        gt_flat = gt.reshape(t, -1)
        pred_flat = pred.reshape(t, -1)

        if mode == "monadic":
            sem_file = gt_file.replace("gt.npy", "sem_lsn.npy")
            if os.path.exists(sem_file):
                sem = np.load(sem_file)
            else:
                sem = np.zeros(t)
                missing_sem += 1
            srgr_cal.run(pred_flat.copy(), gt_flat.copy(), sem)
            l1_calculator.run(pred_flat.copy())
        else:
            l1_calculator.run(gt_flat.copy())

        jitters.append(calculate_jitter(pred, gt))

        gt_np = eval_process_motion(gt.reshape(t, 63, 3))
        pred_np = eval_process_motion(pred.reshape(t, 63, 3))
        pred_all.append(pred_np)
        tar_all.append(gt_np)

        audio_file = gt_file.replace("gt.npy", "lsn_audio.wav")
        if os.path.exists(audio_file):
            audio, _ = load_wav(audio_file, 16000)
            audio = normalize(audio)
            a = alignmenter.align_sample(audio, pred_flat)
            if a is not None:
                align += a
                counter += 1

    lat_pred = lat_gt = None
    if fid_extractor is not None:
        # one batched forward per side; the feature net is hard-wired to
        # 128-frame clips (motion_autoencoder.py lin0 = 59*base), so
        # clips of any other length are skipped (with a count) rather
        # than crashing mid-eval — e.g. rollout dumps of stitched length
        import jax.numpy as jnp

        keep = [i for i, p in enumerate(pred_all)
                if p.shape[0] == FID_POSE_LENGTH]
        fid_skipped = len(pred_all) - len(keep)
        if fid_skipped:
            warnings.warn(
                f"FID: skipping {fid_skipped} clip(s) whose length != "
                f"{FID_POSE_LENGTH} frames (feature net is fixed-length)")
        if len(keep) > 1:
            pred_b = jnp.asarray(np.stack(
                [pred_all[i].reshape(FID_POSE_LENGTH, 189)
                 for i in keep]), jnp.float32)
            gt_b = jnp.asarray(np.stack(
                [tar_all[i].reshape(FID_POSE_LENGTH, 189)
                 for i in keep]), jnp.float32)
            lat_pred = np.asarray(fid_extractor(fid_params, pred_b))
            lat_gt = np.asarray(fid_extractor(fid_params, gt_b))

    out = {
        "n_samples": len(gt_files),
        "alignment": align / counter if counter else None,
        "diversity_pred": calculate_avg_distance(pred_all),
        "diversity_gt": calculate_avg_distance(tar_all),
        "l1div": l1_calculator.avg(),
        "jitter": float(np.mean(jitters)),
    }
    if mode == "monadic":
        if missing_sem:
            # zero semantic weights force SRGR to exactly 0 — flag it so
            # a dump without annotations isn't mistaken for a score
            warnings.warn(
                f"{missing_sem}/{len(gt_files)} samples had no "
                "sem_lsn.npy (zero semantic weights); SRGR is reported "
                "as 'srgr_missing_sem' and is not comparable.")
            out["srgr_missing_sem"] = srgr_cal.avg()
        else:
            out["srgr"] = srgr_cal.avg()
    if lat_pred is not None:
        key = "fid_random_init_features" if fid_random_init else "fid"
        out[key] = frechet_distance(lat_pred, lat_gt)
        if fid_skipped:
            out["fid_skipped_clips"] = fid_skipped
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--result_dir", required=True)
    ap.add_argument("--mode", default="monadic",
                    choices=["monadic", "dyadic"])
    ap.add_argument("--fidnet", default="./experiments/eval/last_499.bin")
    ap.add_argument("--max_samples", type=int, default=None)
    args = ap.parse_args(argv)
    out = evaluate_results(args.result_dir, args.mode, args.fidnet,
                           args.max_samples)
    print(json.dumps(out, indent=2, default=float))
    return out


if __name__ == "__main__":
    main()
