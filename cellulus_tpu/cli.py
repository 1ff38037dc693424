"""Command-line interface (reference parity: ``cellulus/cli.py:9-26``).

Console scripts ``train <config.toml>`` and ``infer <config.toml>``, plus a
combined ``cellulus-tpu {train,infer} <config.toml>`` entry point. Uses only
the standard library (argparse + tomllib).
"""

from __future__ import annotations

import argparse
import sys

from .configs import ExperimentConfig


def _load(config_file: str) -> ExperimentConfig:
    print(f"Reading config from {config_file}")
    return ExperimentConfig.from_toml(config_file)


def train(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Train a cellulus-tpu model")
    parser.add_argument("config_file")
    args = parser.parse_args(argv)
    from .train import train as run

    run(_load(args.config_file))


def infer(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Run cellulus-tpu inference")
    parser.add_argument("config_file")
    args = parser.parse_args(argv)
    from .infer import infer as run

    run(_load(args.config_file))


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser(prog="cellulus-tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    for name in ("train", "infer"):
        p = sub.add_parser(name)
        p.add_argument("config_file")
    args = parser.parse_args(argv)
    if args.command == "train":
        train([args.config_file])
    else:
        infer([args.config_file])


if __name__ == "__main__":
    main()
