"""Package the engine for spark-submit --py-files (north_rule ship
mode): one zip containing the warctools_spark package.

Usage: python tools/package.py [out.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build_zip(out: str) -> str:
    pkg = REPO / "warctools_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "dist" / "engine.zip")
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    print(build_zip(out))
