"""``python -m color_transfer_tpu.cli`` — see run/cli.py."""

from color_transfer_tpu.run.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
