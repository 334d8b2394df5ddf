"""Rewrite ``registry.CHECK_PRIORITY`` from ``tools/derive_window.py``
output — the mechanical half of the evidence-window contract (the
derivation rule lives in derive_window; this applies it).

Usage:
    python tools/rotate_window.py                 # default comment
    python tools/rotate_window.py "<comment>"     # derivation comment
    python tools/rotate_window.py "<comment>" R11 # + archive outgoing
                                                  #   tuple as _R11_WINDOW

Run after a new CORRECTNESS_rN.json lands, or after registering a new
gate query (new queries enter the window at P1, displacing the tail) —
then ``python tools/derive_window.py --check`` must exit clean on the
rewritten tree. The comment should record the round's P1/P2/P3
derivation so the tuple stays auditable.
"""

from __future__ import annotations

import os
import re
import subprocess
import textwrap
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG = os.path.join(REPO, "spark_data_engineering_spark", "registry.py")


def main() -> int:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "derive_window.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    ).stdout
    names = []
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("# displaced"):
            break
        if not line or line.startswith("#"):
            continue
        names.append(line)
    assert len(names) == 50, f"derived window has {len(names)} names"

    with open(REG) as fh:
        src = fh.read()
    m = re.search(
        r"CHECK_PRIORITY: tuple\[str, \.\.\.\] = \(\n(.*?)\n\)\n", src, re.S
    )
    assert m, "CHECK_PRIORITY tuple not found"
    old_names = re.findall(r'"([^"]+)"', m.group(1))

    raw = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "Derived by tools/derive_window.py (see its rule doc)."
    )
    # Normalize to wrapped "    # ..." lines so a raw prose comment
    # can't be injected as bare (syntax-breaking) source.
    comment = "\n".join(
        line if line.lstrip().startswith("#") else "    # " + line.strip()
        for chunk in raw.splitlines()
        for line in textwrap.wrap(chunk, width=66) or [""]
        if line.strip()
    )
    new_body = comment + "\n" + "\n".join(f'    "{n}",' for n in names)
    src = src.replace(
        m.group(0),
        "CHECK_PRIORITY: tuple[str, ...] = (\n" + new_body + "\n)\n",
    )

    archive = sys.argv[2] if len(sys.argv) > 2 else None
    if archive and f"_{archive}_WINDOW" not in src:
        block = (
            f"# The {archive.lower().replace('r', 'round-')} window, "
            "kept for the audit trail.\n"
            f"_{archive}_WINDOW: tuple[str, ...] = (\n"
            + "\n".join(f'    "{n}",' for n in old_names)
            + "\n)\n\n\n"
        )
        anchor = src.index("# The round-10 window")
        src = src[:anchor] + block + src[anchor:]

    with open(REG, "w") as fh:
        fh.write(src)
    print(f"rotated: {len(names)} names; outgoing archived: {archive}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
