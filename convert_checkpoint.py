#!/usr/bin/env python3
"""Convert checkpoints between the reference torch format and native format.

Directions:
  torch .ckpt -> native .ntc   (load reference training runs / pretrained)
  native .ntc -> torch .ckpt   (export runs for the reference's eval_nerf.py)

The reference checkpoint schema is train_nerf.py:373-388 (iter /
model_{coarse,fine}_state_dict / optimizer_state_dict / loss / psnr); weight
layout conversion (out,in) <-> (in,out) lives in nerf_tpu.engine.checkpoint.

Usage:
  python convert_checkpoint.py --input ckpt.ckpt --output ckpt.ntc
  python convert_checkpoint.py --input run.ntc --output run.ckpt [--hwf 400 400 555.5]
"""

from __future__ import annotations

import argparse

# Host-only tool: force the CPU backend BEFORE any backend init so the
# torch-interop path (checkpoint._import_torch initializes the backend
# before importing torch) never claims the single TPU chip — conversion
# needs no accelerator and must work while a training run holds the chip.
import jax

jax.config.update("jax_platforms", "cpu")

from nerf_tpu.engine.checkpoint import (  # noqa: E402
    export_reference_checkpoint,
    load_checkpoint,
    load_reference_checkpoint,
    save_checkpoint,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--hwf", nargs=3, type=float, default=None,
        help="Optional height width focal to embed when exporting to .ckpt "
             "(read by reference eval_nerf.py:138-143).",
    )
    parser.add_argument(
        "--lr", type=float, default=5.0e-3,
        help="Learning rate recorded in the exported optimizer_state_dict "
             "param group (reference resume restores it).",
    )
    args = parser.parse_args()

    to_native = args.output.endswith(".ntc")
    if args.input.endswith(".ckpt") and to_native:
        ckpt = load_reference_checkpoint(args.input)
        save_checkpoint(
            args.output,
            {
                "step": ckpt["step"],
                "params_coarse": ckpt["params_coarse"],
                "params_fine": ckpt["params_fine"],
                "opt_state": {},
                "loss": ckpt.get("loss") or 0.0,
                "psnr": ckpt.get("psnr") or 0.0,
            },
        )
        print(f"torch -> native: {args.input} -> {args.output} (step {ckpt['step']})")
    elif args.input.endswith(".ntc") and args.output.endswith(".ckpt"):
        state = load_checkpoint(args.input)
        export_reference_checkpoint(
            args.output,
            step=int(state.get("step", 0)),
            params_coarse=state["params_coarse"],
            params_fine=state.get("params_fine"),
            loss=float(state.get("loss", 0.0)),
            psnr=float(state.get("psnr", 0.0)),
            hwf=tuple(args.hwf) if args.hwf else None,
            opt_state=state.get("opt_state"),
            lr=args.lr,
        )
        print(f"native -> torch: {args.input} -> {args.output}")
    else:
        raise SystemExit(
            "Unsupported conversion; use .ckpt -> .ntc or .ntc -> .ckpt"
        )


if __name__ == "__main__":
    main()
