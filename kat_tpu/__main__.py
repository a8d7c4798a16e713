"""Allow `python -m kat_tpu ...` as the kat command."""

import sys

from .cli import main

sys.exit(main())
