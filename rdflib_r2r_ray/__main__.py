import sys

from .cli import main

# guard: rayser.register_for_ray imports every package module (ship-by-value);
# only run the CLI when actually invoked as ``python -m rdflib_r2r_ray``
if __name__ == "__main__":
    sys.exit(main())
