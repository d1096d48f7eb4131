"""CLI entry point: ``python -m mpassit_tpu <namelist>`` (defaults to
./fort.41 like the reference driver, mpassit.F90:52-65)."""

import sys

from .run.pipeline import main

sys.exit(main())
