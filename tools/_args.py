"""Positional-arg hygiene for the repo's CLI tools (r10 verdict item 5).

A `python tools/check_parity.py --help` style invocation used to treat
the option token as an sf_dir/output path and WRITE a fixture directory
literally named ``--help`` into the repo root (committed by accident in
round 7, noticed by a judge in round 10). None of these tools define
options, so any option-like positional argument is a usage error — fail
loudly before any filesystem side effect.
"""

from __future__ import annotations

import sys


def positional(argv: list[str] | None = None, usage: str = "") -> list[str]:
    """Return argv[1:], refusing anything that looks like an option."""
    args = (sys.argv if argv is None else argv)[1:]
    bad = [a for a in args if a.startswith("-")]
    if bad:
        raise SystemExit(
            f"option-like positional argument(s) {bad} — these tools take "
            f"no options. {usage}".strip()
        )
    return args
