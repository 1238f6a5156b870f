"""Command-line entry point: ``python -m hevcasm_tpu`` runs the self-test
(the role of the reference's hevcasm executable, src/bin/main.c:39-42);
subcommands expose the encode loop and benchmarks."""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from .config import Tier


def _cmd_selftest(args):
    from . import selftest

    mask = Tier.ALL
    if args.tiers:
        mask = Tier.NONE
        for t in args.tiers.split(","):
            try:
                mask |= Tier[t.strip().upper()]
            except KeyError:
                valid = ", ".join(m.name.lower() for m in (Tier.REF, Tier.JIT, Tier.PALLAS))
                print(f"error: unknown tier '{t}' (valid: {valid})", file=sys.stderr)
                return 2
    suites = args.suites.split(",") if getattr(args, "suites", None) else None
    return selftest.main(mask=mask, time_it=not args.no_time, suites=suites)


def _cmd_encode(args):
    import jax.numpy as jnp

    from .encode import encode_gop, EncodeConfig

    rng = np.random.default_rng(0)
    frames = _synthetic_video(rng, args.frames, args.height, args.width)
    cfg = EncodeConfig(qp=args.qp, search_range=args.search_range)
    out = encode_gop(jnp.asarray(frames), cfg)
    print(
        json.dumps(
            {
                "frames": args.frames,
                "size": f"{args.width}x{args.height}",
                "qp": args.qp,
                "psnr_db": float(out["psnr_db"]),
                "nnz": int(out["nnz"]),
            }
        )
    )
    return 0


def _synthetic_video(rng, t, h, w):
    """Moving-texture synthetic clip: global pan + noise, so motion search
    has real structure to find."""
    base = rng.integers(0, 256, (h + 2 * t + 64, w + 2 * t + 64), dtype=np.uint8)
    frames = np.empty((t, h, w), dtype=np.uint8)
    for i in range(t):
        dy, dx = 2 * i, 3 * i
        frames[i] = base[dy : dy + h, dx : dx + w]
    noise = rng.integers(-2, 3, frames.shape)
    return np.clip(frames.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def _cmd_info(_args):
    """Device + tier availability report: the analogue of
    hevcasm_print_instruction_set_support (hevcasm.c:141-149)."""
    import jax

    from . import registry

    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    for d in jax.devices():
        print(f"  device: {d}")
    print("\nop families and registered tiers:")
    for op in registry.ops():
        tiers = registry.tiers_of(op)
        names = [t.name for t in (Tier.REF, Tier.JIT, Tier.PALLAS) if tiers & t]
        print(f"  {op:24s} {' '.join(names)}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="hevcasm_tpu")
    sub = p.add_subparsers(dest="cmd")
    sub.add_parser("info", help="device + implementation-tier report")

    st = sub.add_parser("selftest", help="kernel self-test + micro-benchmarks")
    st.add_argument("--tiers", help="comma list: ref,jit,pallas (default all)")
    st.add_argument("--suites", help="comma list of suite names (default all)")
    st.add_argument("--no-time", action="store_true")

    enc = sub.add_parser("encode", help="encode a synthetic GOP")
    enc.add_argument("--frames", type=int, default=4)
    enc.add_argument("--width", type=int, default=640)
    enc.add_argument("--height", type=int, default=384)
    enc.add_argument("--qp", type=int, default=32)
    enc.add_argument("--search-range", type=int, default=16)

    args = p.parse_args(argv)
    if args.cmd == "info":
        return _cmd_info(args)
    if args.cmd == "encode":
        return _cmd_encode(args)
    if args.cmd == "selftest" or args.cmd is None:
        if args.cmd is None:
            args = argparse.Namespace(tiers=None, no_time=False)
        return _cmd_selftest(args)
    p.print_help()
    return 2


if __name__ == "__main__":
    sys.exit(main())
