"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Ray workers don't share this process's sys.path: ship the package's
# functions/classes by value inside task specs (see rdflib_r2r_ray.rayser).
from rdflib_r2r_ray.rayser import register_for_ray

register_for_ray()


def entry() -> Any:
    """Flagship pipeline: full KG construction (mapping triples + entity
    linking + canonicalization + dedup) over /root/testdata/sf0.001
    documents; returns the triples Dataset."""
    from rdflib_r2r_ray.driver_api import q_kg_full_documents

    return q_kg_full_documents("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from rdflib_r2r_ray import driver_api

    return driver_api.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same tables, same column names)."""
    from rdflib_r2r_ray import driver_api

    return driver_api.oracle_sql()
