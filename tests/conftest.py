import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

sys.path.insert(0, str(REPO))
if REFERENCE.exists():
    sys.path.insert(0, str(REFERENCE))


def reference_available() -> bool:
    try:
        import hanzo  # noqa: F401

        return True
    except ImportError:
        return False
