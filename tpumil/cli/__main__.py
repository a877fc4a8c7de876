"""`python -m tpumil.cli` — list the available entry points."""

import sys

from tpumil.cli import __doc__ as listing


def main():
    print(listing)
    return 0


if __name__ == "__main__":
    sys.exit(main())
