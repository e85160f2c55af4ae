"""`python -m hive_tpu` — run the full pipeline from the command line.
(Entry parity: reference hive/__main__.py:18-20.)"""

from hive_tpu.pipeline import main

if __name__ == "__main__":
    main()
