"""Checkpoint save/load (orbax) + the reference's checkpoint surgeries.

Reference behaviors replicated (SURVEY.md §5.4):
  * frozen T5 weights stripped on save and re-injected on load
    (base.py:83-123) — here the ``text_encoder/text_model`` subtree
  * stage handoff: diffusion stage transplants VAE-only weights from the
    stage-1 checkpoint (train.py:144-156)
  * resume: newest checkpoint in the experiment dir (train.py:26-53)
  * torch ``.ckpt``/state-dict loading through compat.torch_loader for
    released reference checkpoints
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def _mp_options():
    """Process-LOCAL orbax coordination under multihost.

    Saves are process-0-gated of device_get'd (fully host-local) state
    (cli/train.py); orbax's default options would still run
    ``sync_global_processes`` barriers across ALL processes inside
    ``save`` — a collective only process 0 enters, which deadlocks the
    job (observed: host 0 hung in AsyncCheckpointer.save ->
    sync_global_devices while host 1 exited).  Restores run on every
    process but are read-only, so local coordination is correct there
    too.  Single-process: default options (None)."""
    import jax

    if jax.process_count() <= 1:
        return None
    import orbax.checkpoint as ocp

    me = jax.process_index()
    return ocp.options.MultiprocessingOptions(
        primary_host=me, active_processes={me},
        barrier_sync_key_prefix=f"local{me}")


def _checkpointer():
    import orbax.checkpoint as ocp

    mp = _mp_options()
    if mp is None:
        return ocp.PyTreeCheckpointer()
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler(),
                            multiprocessing_options=mp)


_async_ckpt = None


def _async_checkpointer():
    """Shared AsyncCheckpointer: writes happen on a background thread so
    the train loop isn't blocked on host IO (the reference blocks inside
    Lightning's ModelCheckpoint)."""
    global _async_ckpt
    if _async_ckpt is None:
        import orbax.checkpoint as ocp

        mp = _mp_options()
        kwargs = {} if mp is None else {"multiprocessing_options": mp}
        _async_ckpt = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler(),
                                            **kwargs)
    return _async_ckpt


def wait_for_checkpoints():
    """Block until pending async checkpoint writes are durable."""
    if _async_ckpt is not None:
        _async_ckpt.wait_until_finished()


def strip_frozen_text_model(params: Dict) -> Dict:
    """Drop the frozen T5 stack before writing (base.py:83-92)."""
    out = dict(params)
    if "text_encoder" in out:
        te = dict(out["text_encoder"])
        te.pop("text_model", None)
        out["text_encoder"] = te
    return out


def reinject_frozen_text_model(loaded: Dict, current: Dict) -> Dict:
    """Put the live T5 weights back after load (base.py:94-123).

    Only fills the gap left by ``strip_frozen_text_model`` — a checkpoint
    that DOES carry a trunk (e.g. converted from a full torch checkpoint
    with ``keep_text_model=True``) keeps its own real weights instead of
    being overwritten with the session's init."""
    out = dict(loaded)
    if "text_encoder" in current:
        te = dict(out.get("text_encoder", {}))
        if "text_model" not in te:
            te["text_model"] = current["text_encoder"]["text_model"]
        out["text_encoder"] = te
    return out


def save_checkpoint(ckpt_dir: str, step: int, params: Dict,
                    opt_state=None, keep_text_model: bool = False,
                    background: bool = False):
    """Write ``epoch=<step>``; with ``background`` the write overlaps the
    next epoch's compute (call :func:`wait_for_checkpoints` before exit)."""
    path = Path(ckpt_dir) / f"epoch={step}"
    tree = {"params": params if keep_text_model
            else strip_frozen_text_model(params)}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    ckpt = _async_checkpointer() if background else _checkpointer()
    ckpt.save(str(path.absolute()), tree, force=True)
    return str(path)


def load_checkpoint(path: str, current_params: Optional[Dict] = None,
                    opt_state_template=None):
    """Restore ``epoch=N``.

    ``opt_state_template`` (e.g. ``optimizer.init(params)``) is required
    to get a USABLE optimizer state back: optax states are typed pytrees
    (NamedTuples, masked nodes) and a template-less orbax restore returns
    plain dicts/lists that ``optimizer.update`` cannot traverse.
    """
    item = None
    if opt_state_template is not None:
        if current_params is None:
            raise ValueError(
                "opt_state_template needs current_params for the params "
                "structure")
        item = {"params": strip_frozen_text_model(current_params),
                "opt_state": opt_state_template}
    try:
        tree = _checkpointer().restore(str(Path(path).absolute()),
                                       item=item)
    except Exception as template_err:
        # orbax's structure-mismatch signal varies across versions
        # (ValueError/TypeError/KeyError or orbax-specific classes), so
        # disambiguate by OUTCOME instead of exception type: attempt a
        # template-less params-only restore.  If that succeeds, the
        # checkpoint itself is fine and the failure was a structure
        # mismatch (e.g. a pre-freeze-masking optimizer tree) -> resume
        # with params only (momentum lost, training continues, warning
        # cites the original error).  If it ALSO fails, the checkpoint
        # or IO is genuinely broken -> raise the ORIGINAL error with
        # full context.
        if item is None:
            raise
        try:
            tree = _checkpointer().restore(str(Path(path).absolute()))
        except Exception:
            raise template_err
        import warnings

        warnings.warn(
            f"optimizer state in {path} does not match the current "
            f"optimizer structure ({template_err!r}); resuming with "
            "params only")
        tree["opt_state"] = None
    params = tree["params"]
    if current_params is not None:
        params = reinject_frozen_text_model(params, current_params)
    return params, tree.get("opt_state")


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Highest epoch= checkpoint (train.py:38-44)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(ckpt_dir):
        m = re.match(r"epoch=(\d+)", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def transplant_vae(params: Dict, vae_ckpt_path: str) -> Dict:
    """Load stage-1 VAE weights into a stage-2 param tree
    (train.py:144-156).  Accepts an orbax dir or a torch .ckpt."""
    if vae_ckpt_path.endswith((".ckpt", ".pt", ".pth", ".bin")):
        vae_tree = load_torch_vae(vae_ckpt_path)
    else:
        vae_tree = _checkpointer().restore(
            str(Path(vae_ckpt_path).absolute()))["params"]["vae"]
    out = dict(params)
    out["vae"] = vae_tree
    return out


# ------------------------------------------------- torch checkpoint loading
def _torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    from convofusion_tpu.compat.torch_loader import to_numpy_state_dict

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return to_numpy_state_dict(
        {k: v for k, v in sd.items() if hasattr(v, "detach")})


def maybe_load_t5_assets(params: Dict,
                         num_layers: Optional[int] = None) -> Dict:
    """Inject real t5-base encoder weights from the documented asset
    drop (utils/assets.py) into a freshly initialized param tree,
    mirroring the reference's ``from_pretrained('t5-base')``
    (reference t5.py:28).  No-op when the asset is absent, the tree has
    no text encoder, or the geometry differs (non-production configs)."""
    from convofusion_tpu.utils.assets import asset_path

    te = params.get("text_encoder")
    if not isinstance(te, dict) or "text_model" not in te:
        return params
    path = (asset_path("t5-base/pytorch_model.bin")
            or asset_path("t5-base/model.safetensors"))
    if path is None:
        return params
    from convofusion_tpu.models.t5 import t5_params_from_torch

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        sd = _torch_state_dict(path)
    embed = sd.get("encoder.embed_tokens.weight", sd.get("shared.weight"))
    cur = te["text_model"]["embed_tokens"]["embedding"]
    if embed is None or tuple(embed.shape) != tuple(cur.shape):
        import warnings

        warnings.warn(
            f"t5-base asset at {path} has embed shape "
            f"{None if embed is None else embed.shape}, model expects "
            f"{cur.shape}; skipping injection (non-production geometry)")
        return params
    if num_layers is None:
        num_layers = 1 + max(
            int(m.group(1)) for k in sd
            if (m := re.match(r"encoder\.block\.(\d+)\.", k)))
    te = dict(te)
    te["text_model"] = t5_params_from_torch(sd, num_layers=num_layers)
    out = dict(params)
    out["text_encoder"] = te
    return out


def _infer_skip_layers(sd: Dict, prefix: str) -> int:
    """SkipTransformer num_layers from the highest input_blocks index."""
    idx = [-1]
    for k in sd:
        m = re.match(rf"{re.escape(prefix)}\.input_blocks\.(\d+)\.", k)
        if m:
            idx.append(int(m.group(1)))
    if max(idx) < 0:
        raise KeyError(
            f"no '{prefix}.input_blocks.*' keys in the checkpoint — wrong "
            "--kind, or an unexpected key prefix (e.g. 'module.')")
    return 2 * (max(idx) + 1) + 1


def load_torch_vae(path: str, d_model: Optional[int] = None,
                   num_layers: Optional[int] = None) -> Dict:
    """Reference stage-1 checkpoint -> our VAE param tree.

    Handles both bare-VAE state dicts and full-model ones with a ``vae.``
    prefix (train.py:148-152 strips it the same way).  Architecture dims
    are inferred from the state dict when not given."""
    from convofusion_tpu.compat import torch_loader as tl

    sd = _torch_state_dict(path)
    prefix = "vae" if any(k.startswith("vae.") for k in sd) else ""
    p = (prefix + ".") if prefix else ""
    if d_model is None:
        d_model = sd[f"{p}body_skel_embedding.weight"].shape[0]
    if num_layers is None:
        num_layers = _infer_skip_layers(sd, f"{p}body_encoder")
    return tl.vae_params(sd, d_model, num_layers, prefix=prefix)


def load_torch_full_model(path: str, current_params: Dict,
                          vae_layers: Optional[int] = None,
                          vae_dim: Optional[int] = None,
                          denoiser_layers: Optional[int] = None,
                          denoiser_dim: Optional[int] = None) -> Dict:
    """Released full reference checkpoint -> our param tree (vae +
    denoiser + audio encoder + fuser + t5 projection).  Architecture dims
    are inferred from the state dict when not given."""
    from convofusion_tpu.compat import torch_loader as tl
    from convofusion_tpu.models.t5 import t5_params_from_torch

    sd = _torch_state_dict(path)
    params = dict(current_params)
    if vae_dim is None:
        vae_dim = sd["vae.body_skel_embedding.weight"].shape[0]
    if vae_layers is None:
        vae_layers = _infer_skip_layers(sd, "vae.body_encoder")
    if denoiser_dim is None:
        denoiser_dim = sd["denoiser.latent_embd.weight"].shape[0]
    if denoiser_layers is None:
        denoiser_layers = 1 + max(
            int(m.group(1)) for k in sd
            if (m := re.match(r"denoiser\.decoder\.layers\.(\d+)\.", k)))
    params["vae"] = tl.vae_params(sd, vae_dim, vae_layers, prefix="vae")
    params["denoiser"] = tl.denoiser_params(
        sd, denoiser_dim, denoiser_layers, prefix="denoiser")

    ae = {}
    p = "text_audio_encoder.audio_encoder"
    ae["main_0"] = tl.linear(sd, f"{p}.main.0")
    ae["main_3"] = tl.linear(sd, f"{p}.main.3")
    ae["out_net"] = tl.linear(sd, f"{p}.out_net")
    params["audio_encoder"] = ae

    te = dict(current_params["text_encoder"])
    te["projection_1"] = tl.linear(
        sd, "text_audio_encoder.text_encoder.projection.1")
    t5_keys = {k[len("text_audio_encoder.text_encoder.text_model."):]: v
               for k, v in sd.items()
               if k.startswith("text_audio_encoder.text_encoder.text_model.")}
    if t5_keys:
        # infer the encoder depth instead of assuming t5-base's 12
        t5_layers = 1 + max(
            int(m.group(1)) for k in t5_keys
            if (m := re.match(r"encoder\.block\.(\d+)\.", k)))
        te["text_model"] = t5_params_from_torch(t5_keys,
                                                num_layers=t5_layers)
    params["text_encoder"] = te

    params["condition_fuser"] = {
        "active_passive_emb": tl.embedding(
            sd, "condition_fuser.active_passive_emb"),
        "lsn_id_emb": tl.embedding(sd, "condition_fuser.lsn_id_emb"),
    }
    return params
