"""Regenerate docs/cli.md from the argparse definitions.

Run from the repo root: python tools/gen_cli_docs.py
Doubles as a formatting check — argparse raises on malformed help
strings (e.g. an unescaped %) only when help is actually rendered.
"""

import contextlib
import io
import os

os.environ["COLUMNS"] = "80"  # stable help wrapping across terminals

from ann3depth_tpu.cli import build_parser

SUBS = ["train", "eval", "live", "infer", "download", "prepare", "bench",
        "export", "serve", "sweep", "info"]


def _help_of(parser, argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        try:
            parser.parse_args(argv)
        except SystemExit:
            pass
    return buf.getvalue().rstrip()


def generate() -> str:
    p = build_parser()
    out = ["# CLI reference",
           "",
           "Generated from the argparse definitions (`ann3depth_tpu/cli.py`) —",
           "regenerate with `python tools/gen_cli_docs.py` after changing "
           "flags.",
           "",
           "```", _help_of(p, ["--help"]), "```", ""]
    for s in SUBS:
        out += [f"## `{s}`", "", "```", _help_of(p, [s, "--help"]), "```", ""]
    return "\n".join(out) + "\n"


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "cli.md")
    with open(path, "w") as f:
        f.write(generate())
    print(f"wrote {os.path.normpath(path)}")
