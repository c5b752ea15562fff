"""Stdlib docs-site integrity check: every page named in mkdocs.yml's nav
exists, and every relative markdown link / image inside docs/ (and the
top-level README) resolves to a real file. The buildable-site analogue for
an environment where mkdocs cannot install (no egress); CI runs mkdocs
itself when available (ref contrast: /root/reference/mkdocs.yml:1 relies
on the mkdocs build to fail on bad nav entries).

Exit code 1 with a per-problem listing on any failure.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOCS = REPO / "docs"

LINK_RE = re.compile(r"!?\[[^\]]*\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")


def nav_pages(mkdocs_yml: Path) -> list[str]:
    """Extract the .md page paths from the nav section (stdlib-only: the
    nav entries are simple `Title: path.md` scalars, no yaml dep needed)."""
    pages = []
    for line in mkdocs_yml.read_text().splitlines():
        m = re.search(r":\s*([\w./-]+\.md)\s*$", line)
        if m:
            pages.append(m.group(1))
    return pages


def check() -> list[str]:
    problems: list[str] = []

    mkdocs_yml = REPO / "mkdocs.yml"
    for page in nav_pages(mkdocs_yml):
        if not (DOCS / page).is_file():
            problems.append(f"mkdocs.yml nav entry missing on disk: docs/{page}")

    md_files = sorted(DOCS.rglob("*.md")) + [REPO / "README.md"]
    for md in md_files:
        for n, line in enumerate(md.read_text().splitlines(), 1):
            for m in LINK_RE.finditer(line):
                target = m.group(1)
                if re.match(r"^[a-z]+:", target) or target.startswith("#"):
                    continue  # external URL or in-page anchor
                path = target.split("#", 1)[0]
                if not path:
                    continue
                resolved = (md.parent / path).resolve()
                if not resolved.exists():
                    problems.append(
                        f"{md.relative_to(REPO)}:{n}: broken link -> {target}"
                    )
    return problems


if __name__ == "__main__":
    problems = check()
    for p in problems:
        print(p)
    n_md = len(list(DOCS.rglob("*.md"))) + 1
    print(f"check_links: {n_md} markdown files, {len(problems)} problem(s)")
    sys.exit(1 if problems else 0)
