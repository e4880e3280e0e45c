"""`python -m spadot_tpu` entry point (reference: SpaDOT/__main__.py:1-4)."""
from spadot_tpu.cli import main

if __name__ == "__main__":
    main()
