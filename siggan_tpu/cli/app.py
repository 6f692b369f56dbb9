"""Control-panel CLI (the reference's ``streamlit run app…`` entry).

Usage:
    python -m siggan_tpu.cli.app [--port 8501] [--workdir .]
"""

from __future__ import annotations

import argparse
import sys


def parse_arguments(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Serve the signature GAN control panel")
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8501)
    p.add_argument("--workdir", type=str, default=".",
                   help="root containing checkpoints/, runs/, data/")
    p.add_argument("--tpu", action="store_true",
                   help="let the panel itself use the TPU. Default is CPU: "
                        "a TPU chip has a SINGLE owning process, and the "
                        "panel must leave it free for the training "
                        "subprocesses it launches (they block forever "
                        "otherwise). Panel-side generation on CPU is "
                        "slower but correct.")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_arguments(argv)
    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from siggan_tpu.core.platform import setup
    setup()

    from siggan_tpu.serve.app import serve

    server = serve(args.host, args.port, args.workdir)
    print(f"Control panel on http://{args.host}:{args.port} "
          f"(workdir {args.workdir})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
