"""Generate docs/QUALITY.md: the quantization-quality matrix on a trained
tiny model, driven through the PUBLIC CLIs (VERDICT r3 #5).

The reference publishes no in-repo quality numbers (its README defers to
the quip-sharp blog, ``/root/reference/README.md:18``); this environment is
zero-egress, so real-checkpoint wikitext2 parity cannot run. The closest
honest approximation: train a tiny llama on the synthetic Markov stream
until it clearly beats uniform, export it as a real HF-format checkpoint
(``utils.hf_import.save_hf_model``), then for every cell run

    python -m quip_for_all_tpu.cli.quantize --model-path <hf_dir> ...
    python -m quip_for_all_tpu.cli.eval_ppl --model-path <ckpt> ...

as SUBPROCESSES — the exact commands a user would run, no test internals.
Calibration uses synthetic seed 0; eval uses held-out seed 2.

    python tools/quality_matrix.py [--fast] [--out docs/QUALITY.md]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CODEBOOKS = ("E8P12", "D4", "HI", "E8P12RVQ3B", "E8P12RVQ4B")
BITS = {"E8P12": 2, "D4": 2, "HI": 4, "E8P12RVQ3B": 3, "E8P12RVQ4B": 4}


def train_tiny(workdir: str, steps_scale: int = 1):
    """Train the tiny llama (tests/test_quality.py fixture recipe, but on
    8x the data so it GENERALIZES: the matrix evals a held-out draw of the
    same Markov process, and 512 samples only memorize — held-out ppl came
    out above uniform) and export it as an HF checkpoint; returns
    (cfg, params, hf_dir)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("QFA_PALLAS_INTERPRET", "1")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from quip_for_all_tpu.data.calibration import synthetic_tokens
    from quip_for_all_tpu.models import llama as M
    from quip_for_all_tpu.models.config import tiny_config
    from quip_for_all_tpu.utils.hf_import import save_hf_model

    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    data = synthetic_tokens(4096, 32, cfg.vocab_size, seed=11)

    def loss_fn(params, ids):
        logits, _ = M.model_apply(cfg, params, ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = ids[:, 1:]
        return -jnp.take_along_axis(logp, tgt[..., None], -1).mean()

    opt = optax.adam(2e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, ids):
        loss, g = jax.value_and_grad(loss_fn)(params, ids)
        upd, state = opt.update(g, state, params)
        return optax.apply_updates(params, upd), state, loss

    for _ in range(3 * steps_scale):
        for i in range(0, 4096, 16):
            params, state, loss = step(params, state,
                                       jnp.asarray(data[i:i + 16]))
    print(f"# final train loss {float(loss):.3f}", file=sys.stderr)
    hf_dir = os.path.join(workdir, "trained_tiny_hf")
    save_hf_model(cfg, params, hf_dir)
    return cfg, params, hf_dir


def run_cli(mod: str, argv: list, timeout_s: float = 1200.0) -> str:
    env = dict(os.environ, JAX_PLATFORMS="cpu", QFA_PALLAS_INTERPRET="1")
    proc = subprocess.run(
        [sys.executable, "-m", f"quip_for_all_tpu.cli.{mod}"] + argv,
        capture_output=True, text=True, timeout=timeout_s, env=env,
        cwd=ROOT)
    if proc.returncode != 0:
        raise RuntimeError(f"{mod} {argv} failed:\n"
                           + proc.stdout[-2000:] + proc.stderr[-2000:])
    return proc.stdout


EVAL_ARGS = ["--dataset", "synthetic", "--nsamples", "16",
             "--seqlen", "32", "--batch-size", "8", "--seed", "2"]


def eval_ppl(ckpt: str) -> float:
    out = run_cli("eval_ppl", ["--model-path", ckpt] + EVAL_ARGS)
    return json.loads(out.strip().splitlines()[-1])["ppl"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "docs",
                                                  "QUALITY.md"))
    ap.add_argument("--workdir", default="/tmp/qfa_quality")
    ap.add_argument("--fast", action="store_true",
                    help="E8P12-only (wiring check)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.time()

    cfg, params, hf_dir = train_tiny(args.workdir)

    # fp16-reference ppl on the held-out eval draw (tool-internal: the
    # float model has no quantized checkpoint for eval_ppl to load)
    from quip_for_all_tpu.data.calibration import synthetic_tokens
    from quip_for_all_tpu.runtime.generate import perplexity
    eval_toks = synthetic_tokens(16, 32, cfg.vocab_size, seed=2)
    ppl_f = float(perplexity(cfg, params, eval_toks, batch_size=8))
    print(f"# fp32 reference ppl {ppl_f:.3f}", file=sys.stderr)

    base_q = ["--dataset", "synthetic", "--nsamples", "32", "--seqlen",
              "32", "--batch-size", "8", "--quip-tune-iters", "2",
              "--seed", "0"]

    rows = []     # (codebook, variant, ppl)

    def cell(cb: str, variant: str, extra: list) -> None:
        ckpt = os.path.join(args.workdir, f"{cb}_{variant}")
        t0 = time.time()
        run_cli("quantize", ["--model-path", hf_dir, "--save-dir", ckpt,
                             "--codebook", cb] + base_q + extra)
        ppl = eval_ppl(ckpt)
        rows.append((cb, variant, ppl))
        print(f"# {cb:11s} {variant:9s} ppl {ppl:8.3f} "
              f"({time.time()-t0:.0f}s)", file=sys.stderr)

    for cb in CODEBOOKS[:1] if args.fast else CODEBOOKS:
        cell(cb, "base", [])
    if not args.fast:
        cell("E8P12", "ft", ["--ft-epochs", "2", "--ft-train-size", "24",
                             "--ft-valid-size", "8"])
        cell("E8P12", "merge_suv", ["--merge-suv"])
        cell("E8P12", "tp2", ["--tp-shards", "2"])

    # int8-KV ppl: teacher-forced forward THROUGH a quantized KV cache
    # (attention reads dequantized int8 K/V) — decode-path quality that a
    # cache-free ppl forward cannot see
    import jax.numpy as jnp
    import numpy as np
    from quip_for_all_tpu.models import llama as M
    from quip_for_all_tpu.runtime.generate import init_kv_caches
    from quip_for_all_tpu.utils.checkpoint import load_quantized

    def kv_ppl(ckpt: str, quantized: bool) -> float:
        import jax
        cfg2, qp, _ = load_quantized(ckpt)
        S = eval_toks.shape[1]

        @jax.jit
        def nll(batch):
            caches = init_kv_caches(cfg2, batch.shape[0], S,
                                    dtype=jnp.float32, quantized=quantized)
            pos = jnp.arange(S)[None, :].repeat(batch.shape[0], 0)
            logits, _ = M.model_apply(cfg2, qp, batch, positions=pos,
                                      kv_caches=caches, cache_position=0,
                                      dtype=jnp.float32)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32),
                                      -1)
            tgt = batch[:, 1:]
            return -jnp.take_along_axis(logp, tgt[..., None], -1).mean()

        losses = [float(nll(jnp.asarray(eval_toks[i:i + 8])))
                  for i in range(0, 16, 8)]
        return float(np.exp(np.mean(losses)))

    base_ckpt = os.path.join(args.workdir, "E8P12_base")
    if os.path.isdir(base_ckpt):
        rows.append(("E8P12", "kv_bf16ref", kv_ppl(base_ckpt, False)))
        rows.append(("E8P12", "kv_int8", kv_ppl(base_ckpt, True)))
        print(f"# kv cells done", file=sys.stderr)

    lines = [
        "# QUALITY — quantization quality matrix (trained tiny model, "
        "CLI-level)",
        "",
        f"Generated by `python tools/quality_matrix.py` "
        f"({time.time()-t_start:.0f}s, CPU). The reference publishes no "
        "in-repo quality numbers (README.md:18 defers to the quip-sharp "
        "blog) and this environment is zero-egress, so the matrix runs "
        "on a locally TRAINED tiny llama (2 layers, synthetic Markov "
        "stream, clearly beats uniform) exported as a real HF checkpoint "
        "and driven through the public CLIs:",
        "",
        "    python -m quip_for_all_tpu.cli.quantize --model-path "
        "<trained_hf> --save-dir <ckpt> --codebook <CB> --dataset "
        "synthetic --nsamples 32 --seqlen 32 --quip-tune-iters 2",
        "    python -m quip_for_all_tpu.cli.eval_ppl --model-path <ckpt> "
        "--dataset synthetic --nsamples 16 --seqlen 32 --seed 2",
        "",
        "Calibration draw: seed 0; eval draw: held-out seed 2. The "
        "kv_int8 row is teacher-forced ppl THROUGH a quantized int8 KV "
        "cache (decode-path quality; kv_bf16ref is the same cache-path "
        "forward with bf16 KV for comparison).",
        "",
        f"**fp32 reference ppl: {ppl_f:.3f}** (vocab 256; uniform = 256)",
        "",
        "| codebook | bits | variant | ppl | × fp32 |",
        "|---|---|---|---|---|",
    ]
    for cb, variant, ppl in rows:
        lines.append(f"| {cb} | {BITS[cb]} | {variant} | {ppl:.3f} | "
                     f"{ppl / ppl_f:.3f} |")
    lines += [
        "",
        "Expected orderings (asserted continuously in "
        "tests/test_quality.py): RVQ4B < RVQ3B < E8P12 (more bits help "
        "monotonically); HI < D4; every variant cell in the base band.",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"# wrote {args.out}", file=sys.stderr)
    print(json.dumps({"rows": [(c, v, round(p, 3)) for c, v, p in rows],
                      "fp32": round(ppl_f, 3)}))


if __name__ == "__main__":
    main()
