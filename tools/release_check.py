"""Release consistency gate (the release-plz analog's sanity layer).

Checks that pyproject's version has a matching ``## <version>`` section
in CHANGELOG.md, and — with ``--tag vX.Y.Z`` — that the tag names that
same version.  Run locally or from .github/workflows/release.yml.
"""

from __future__ import annotations

import argparse
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def package_version() -> str:
    text = (ROOT / "pyproject.toml").read_text()
    m = re.search(r'^version\s*=\s*"([^"]+)"', text, re.M)
    if not m:
        raise SystemExit("no version in pyproject.toml")
    return m.group(1)


def changelog_has(version: str) -> bool:
    text = (ROOT / "CHANGELOG.md").read_text()
    return re.search(rf"^##\s+\[?{re.escape(version)}\]?\b", text,
                     re.M) is not None


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tag", default=None,
                   help="git tag to verify (vX.Y.Z)")
    args = p.parse_args(argv)

    version = package_version()
    if not changelog_has(version):
        print(f"CHANGELOG.md has no '## {version}' section", file=sys.stderr)
        return 1
    if args.tag is not None:
        want = args.tag.lstrip("v")
        if want != version:
            print(f"tag {args.tag} != package version {version}",
                  file=sys.stderr)
            return 1
    print(f"release check ok: version {version}"
          + (f", tag {args.tag}" if args.tag else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
