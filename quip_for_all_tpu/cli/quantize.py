"""Quantization CLI — the reference README's quantize_model flow
(``README.md:23-35``) as a command.

    python -m quip_for_all_tpu.cli.quantize --model-path <hf_dir> \
        --save-dir out/ --codebook E8P12 --dataset wikitext2 \
        --nsamples 4096 --tp-shards 8
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from . import honor_platform_env
    honor_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-path", required=True,
                    help="HF model dir (config.json + safetensors) or "
                         "'random:<preset>' for a random-init model "
                         "(presets: tiny, llama2_7b, llama2_70b, "
                         "mixtral_8x7b)")
    ap.add_argument("--save-dir", required=True)
    ap.add_argument("--codebook", default="E8P12",
                    choices=["D4", "E8P12", "HI", "E8P12RVQ3B",
                             "E8P12RVQ4B"])
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--split", default="train",
                    choices=["train", "validation"])
    ap.add_argument("--nsamples", type=int, default=4096)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--quip-tune-iters", type=int, default=10)
    ap.add_argument("--sigma-reg", type=float, default=0.01)
    ap.add_argument("--rescale-WH", action="store_true")
    ap.add_argument("--no-use-rand", action="store_true")
    ap.add_argument("--per-channel", action="store_true")
    ap.add_argument("--merge-suv", action="store_true")
    ap.add_argument("--ft-epochs", type=int, default=0)
    ap.add_argument("--ft-train-size", type=int, default=384)
    ap.add_argument("--ft-valid-size", type=int, default=128)
    ap.add_argument("--modules-to-not-convert", nargs="*", default=None)
    ap.add_argument("--tp-shards", type=int, default=1)
    ap.add_argument("--ft-pp", type=int, default=1,
                    help="pipeline the end-to-end CE finetune over this "
                    "many devices (models exceeding one chip)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ..data.calibration import get_calibration_tokens
    from ..models import llama as M
    from ..models.config import (ModelConfig, llama2_7b_config,
                                 llama2_70b_config, mixtral_8x7b_config,
                                 tiny_config)
    from ..quantize.quantizer import QuipQuantizer
    from ..utils.checkpoint import save_quantized
    from ..utils.hf_import import load_hf_model

    if args.model_path.startswith("random:"):
        preset = args.model_path.split(":", 1)[1]
        cfg = {"tiny": tiny_config, "llama2_7b": llama2_7b_config,
               "llama2_70b": llama2_70b_config,
               "mixtral_8x7b": mixtral_8x7b_config}[preset]()
        params = M.init_llama_params(cfg, seed=args.seed)
        tokenizer = None
    else:
        cfg, params = load_hf_model(args.model_path)
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(args.model_path)
        except Exception:
            tokenizer = None

    q = QuipQuantizer(
        codebook=args.codebook, nsamples=args.nsamples,
        model_seqlen=args.seqlen, quip_tune_iters=args.quip_tune_iters,
        sigma_reg=args.sigma_reg, rescale_WH=args.rescale_WH,
        use_rand=not args.no_use_rand, per_channel=args.per_channel,
        merge_suv=args.merge_suv, batch_size=args.batch_size,
        ft_epochs=args.ft_epochs, ft_train_size=args.ft_train_size,
        ft_valid_size=args.ft_valid_size,
        modules_to_not_convert=args.modules_to_not_convert,
        tp_shards=args.tp_shards, ft_pp=args.ft_pp, seed=args.seed)

    total = args.nsamples + (args.ft_train_size + args.ft_valid_size
                             if args.ft_epochs > 0 else 0)
    calib = get_calibration_tokens(args.dataset, tokenizer, total,
                                   args.seqlen, seed=args.seed, split=args.split,
                                   vocab_size=cfg.vocab_size)
    params = q.quantize_model(cfg, params, calib)
    save_quantized(cfg, params, q.to_dict(), args.save_dir)
    print(f"saved quantized model to {args.save_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
