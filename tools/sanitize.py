"""Run the runtime sanitizer (utils/sanitize.py) against a model.

The TPU-side analog of running a CUDA build under compute-sanitizer:

    python tools/sanitize.py                 # tiny built-in model, CPU ok
    python tools/sanitize.py --model llama2_7b --codebook E8P12  # on chip
    python tools/sanitize.py --load /path/to/quantized_checkpoint

Checks: jitted decode-step determinism (bit-compare across runs),
input-buffer purity, logits finiteness, and kernel-variant parity for
every codebook the model uses. Exit code 0 iff every check passes.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny",
                    help="tiny | a shape preset from bench.py (random "
                         "quantized weights)")
    ap.add_argument("--codebook", default="E8P12")
    ap.add_argument("--load", default=None,
                    help="path to a quantized checkpoint dir (overrides "
                         "--model)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from quip_for_all_tpu.utils.sanitize import (
        SanitizerReport, check_variant_parity, sanitize_decode_step)

    if args.load:
        from quip_for_all_tpu.utils.checkpoint import load_quantized
        cfg, params = load_quantized(args.load)
    elif args.model == "tiny":
        from quip_for_all_tpu.models.config import tiny_config
        from quip_for_all_tpu.utils.random_quantized import (
            random_quantized_model)
        cfg = tiny_config()
        params = random_quantized_model(cfg, codebook=args.codebook, seed=0)
    else:
        from quip_for_all_tpu.models.config import llama2_7b_config
        from quip_for_all_tpu.utils.random_quantized import (
            random_quantized_model)
        cfg = llama2_7b_config()
        params = random_quantized_model(cfg, codebook=args.codebook, seed=0,
                                        dtype=jnp.bfloat16)

    print(f"[sanitize] model arch={cfg.arch} d={cfg.hidden_size} "
          f"layers={cfg.num_hidden_layers}", file=sys.stderr)

    rep = sanitize_decode_step(cfg, params, repeats=args.repeats)

    # variant parity on one representative QuantizedTensor per codebook
    from quip_for_all_tpu.nn.qlinear import QuantLinearParams
    seen = set()
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            params, is_leaf=lambda x: isinstance(x, QuantLinearParams)):
        if not isinstance(leaf, QuantLinearParams):
            continue
        cb = leaf.qweight.codebook_id
        if cb in seen:
            continue
        seen.add(cb)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (8, leaf.qweight.q_in)), dtype=jnp.bfloat16)
        sub = check_variant_parity(leaf.qweight, x)
        print(f"[sanitize] variant parity [{cb}]: "
              f"{'ok' if sub.ok else 'FAIL'}", file=sys.stderr)
        rep.merge(sub)

    print(rep.summary())
    return 0 if rep.ok else 1


if __name__ == "__main__":
    sys.exit(main())
