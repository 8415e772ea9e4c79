"""`python -m metacache_tpu` == the `metacache` CLI (main.cpp:41-106)."""
import sys

from .cli import main

sys.exit(main())
