#!/usr/bin/env python3
"""spark-submit main: thin shim over bbcrawl_spark.__main__ (the package
arrives on executors via --py-files; see scripts/submit.sh)."""

import sys

from bbcrawl_spark.__main__ import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
