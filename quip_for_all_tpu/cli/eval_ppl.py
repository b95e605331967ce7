"""Perplexity evaluation CLI (wikitext2/C4) — the quality-parity eval the
reference defers to the quip-sharp blog (``README.md:18``); first-class here
per BASELINE.md north-star metrics.

    python -m quip_for_all_tpu.cli.eval_ppl --model-path ckpt/ \
        --dataset wikitext2-test --nsamples 64
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    from . import honor_platform_env
    honor_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--dataset", default="wikitext2-test")
    ap.add_argument("--nsamples", type=int, default=64)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--split", default="validation",
                    choices=["train", "validation"])
    ap.add_argument("--sp", type=int, default=0,
                    help="shard the sequence dim over this many devices "
                    "(ring-attention sequence parallelism) — evaluate "
                    "windows longer than one device's memory")
    ap.add_argument("--seed", type=int, default=0,
                    help="sampling seed for the eval window draw (use a "
                    "seed distinct from calibration for synthetic data)")
    args = ap.parse_args(argv)

    from ..data.calibration import get_calibration_tokens
    from ..runtime.generate import perplexity
    from ..utils.checkpoint import load_quantized

    cfg, params, qcfg = load_quantized(args.model_path)
    tokenizer = None
    if args.dataset != "synthetic":
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer
                                                  or args.model_path)
    toks = get_calibration_tokens(args.dataset, tokenizer, args.nsamples,
                                  args.seqlen, seed=args.seed,
                                  split=args.split,
                                  vocab_size=cfg.vocab_size)
    sp_mesh = None
    if args.sp > 1:
        from ..parallel.sequence import make_sp_mesh
        sp_mesh = make_sp_mesh(args.sp)
    ppl = perplexity(cfg, params, toks, batch_size=args.batch_size,
                     sp_mesh=sp_mesh)
    print(json.dumps({"dataset": args.dataset, "seqlen": args.seqlen,
                      "nsamples": args.nsamples,
                      "codebook": qcfg.get("codebook"), "ppl": ppl}))


if __name__ == "__main__":
    main()
