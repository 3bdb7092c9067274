"""Learning-loop proof: the system must demonstrably LEARN, not just
compute parity-correct forwards (reference train.py:174-179 — the
reason the framework exists is trainer.fit to a model whose samples
score; quant_eval/dyadic_eval.py:359-454).

Protocol and fixture: train/overfit.py — the provably-compressible
lowrank fixture (16 numbers/clip of information) through the REAL
cli/train + cli/test entry points.  Measured escape dynamics and the
recipe derivation are in docs/BENCHMARKS.md "Learning loop".

Two tiers:
* ``test_stage1_vae_escapes_saddle`` (slow) — CPU-affordable slice of
  the proof: 600 epochs of stage-1 at lr 2e-3 must break out of the
  mean-prediction saddle.  A broken train path scores relRMSE 0.93-1.0
  (that band is exactly what rounds 1-4 shipped); the working recipe
  measures 0.763 at this budget (v5e), so the 0.85 bound separates the
  two decisively.  ~25 min on a 1-CPU host, ~3 min on chip.
* ``test_two_stage_proof`` — the FULL validated recipe (stage-1 2000
  epochs to relRMSE<=0.15, stage-2 through conditioned DDIM-50
  reproduction + trained-vs-untrained eval).  ~25 min on a v5e chip but
  hours on a 1-CPU host, so it runs only when a non-CPU jax backend is
  present or CONVOFUSION_TPU_FULL_PROOF=1 forces it.  The committed
  artifact of a passing run is docs/artifacts/overfit_result.json
  (regenerate: python -m convofusion_tpu.train.overfit
  --workdir /tmp/overfit --assert-thresholds).
"""
import json
import os

import pytest

# NOTE: no module-level slow mark — the artifact-threshold consistency
# check below is sub-second and belongs in the fast tier; the two
# training tests carry their own @pytest.mark.slow.


@pytest.mark.slow
def test_stage1_vae_escapes_saddle(tmp_path):
    from convofusion_tpu.cli.train import main as train_main
    from convofusion_tpu.train.overfit import (
        build_fixture,
        vae_recon_error,
        write_cfg,
    )

    workdir = str(tmp_path)
    beat, dnd = build_fixture(workdir)
    cfg1, assets1 = write_cfg(
        workdir, beat, dnd, "overfit_vae", stage="vae", epochs=600,
        batch=7, lr=2e-3, scale="small")
    train_main(["--cfg", cfg1, "--cfg_assets", assets1])
    ckpt = os.path.join(workdir, "experiments", "convofusion",
                        "overfit_vae", "checkpoints", "epoch=599")
    assert os.path.isdir(ckpt)
    err = vae_recon_error(cfg1, assets1, ckpt)
    # broken band (mean prediction): 0.93-1.0; measured at this budget:
    # 0.763 (v5e fp32).  docs/BENCHMARKS.md "Learning loop".
    assert err < 0.85, (
        f"stage-1 VAE did not escape the mean-prediction saddle: "
        f"relRMSE {err:.4f} (>=0.93 = not learning; working recipe "
        f"measures ~0.76 at this budget)")


def _full_proof_enabled():
    if os.environ.get("CONVOFUSION_TPU_FULL_PROOF") == "1":
        return True
    import jax

    return jax.devices()[0].platform != "cpu"


@pytest.mark.slow
def test_two_stage_proof(tmp_path):
    if not _full_proof_enabled():
        pytest.skip(
            "full two-stage proof needs a chip (hours on a 1-CPU host); "
            "set CONVOFUSION_TPU_FULL_PROOF=1 to force — committed "
            "passing artifact: docs/artifacts/overfit_result.json")
    from convofusion_tpu.train.overfit import DEFAULT_THRESHOLDS, run

    out = run(str(tmp_path), thresholds=DEFAULT_THRESHOLDS)
    # artifact for the record
    print(json.dumps(out, indent=2))


def test_committed_artifact_passes_thresholds():
    """The committed proof artifact must satisfy the same thresholds the
    live run asserts (guards against editing one without the other)."""
    from convofusion_tpu.train.overfit import (
        DEFAULT_THRESHOLDS,
        _check_thresholds,
    )

    path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "artifacts", "overfit_result.json")
    with open(path) as f:
        out = json.load(f)
    _check_thresholds(out, DEFAULT_THRESHOLDS)
