#!/usr/bin/env python3
"""Top-level launcher — `python run.py` starts the interactive path tracer
(GUI if PyQt5 is available, else suggest --headless). Equivalent of the
reference's root run.py."""

import sys

from tpu_rt.app.run import main

if __name__ == "__main__":
    sys.exit(main())
