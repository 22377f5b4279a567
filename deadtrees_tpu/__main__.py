"""Package CLI.

Mirrors the reference's ``deadtrees version`` subcommand
(/root/reference/deadtrees/__main__.py:9-16) plus train/eval entry points.
"""

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="deadtrees-tpu")
    sub = parser.add_subparsers(dest="command")
    sub.add_parser("version", help="print package version")

    train_p = sub.add_parser("train", help="run training (same as run.py)")
    train_p.add_argument("overrides", nargs="*", help="config overrides key=value")

    eval_p = sub.add_parser("eval", help="run evaluation (same as eval.py)")
    eval_p.add_argument("overrides", nargs="*", help="config overrides key=value")

    args = parser.parse_args(argv)

    if args.command == "version":
        from deadtrees_tpu.version import __version__

        print(__version__)
        return 0
    if args.command == "train":
        from deadtrees_tpu.train.entry import train_from_cli

        train_from_cli(args.overrides)
        return 0
    if args.command == "eval":
        from deadtrees_tpu.train.entry import eval_from_cli

        eval_from_cli(args.overrides)
        return 0

    parser.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
