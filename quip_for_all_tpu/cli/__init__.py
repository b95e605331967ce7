"""CLI entry points (quantize / generate / eval_ppl / finetune_lora).

Platform honor: environments that force-register a remote-TPU PJRT
plugin via sitecustomize can override ``JAX_PLATFORMS=cpu`` from the
environment — measured 15:25 r5: ``env JAX_PLATFORMS=cpu python -c
"import jax; jax.default_backend()"`` returned ``tpu``, which silently
put every "CPU" CLI subprocess (e.g. the quality-matrix children) on the
hardware chip: concurrent chip contention, bf16 MXU rounding inside f32
quantization math, and a d=512 Hessian driven indefinite past the
sigma_reg escalation ("Hessian is not invertible"). Explicitly updating
jax's config after import is authoritative, so every CLI main() starts
by re-asserting the env var's request.
"""
from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Make an explicit ``JAX_PLATFORMS`` env request authoritative even
    when a sitecustomize hook registered a different default backend."""
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if want:
        import jax
        try:
            jax.config.update("jax_platforms", want)
        except Exception:  # noqa: BLE001 — old jax without the option
            pass
