"""F2 — the per-species driver loop.

The reference's process entry point iterates searchable non-human species and runs
the §3.1 flow per species (OrthologRelationLoadingManager.java:89-94). Species runs
are independent (disjoint (src, dest_species) key spaces), so the loop is a driver
loop over a broadcast-small species dimension — each iteration one Spark DAG.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ortholog_pipeline_spark.plans.species_load import (
    SpeciesLoadResult,
    run_species_load,
)
from ortholog_pipeline_spark.schemas import HUMAN
from ortholog_pipeline_spark.sources.state import StateStore


def searchable_species_keys(species: DataFrame) -> list[int]:
    """Searchable, non-human species keys (F2: ``isSearchable(key) && key != HUMAN``,
    Manager.java:89-94) — collected driver-side from the (tiny) species dim."""
    rows = (
        species.filter(
            (F.col("is_searchable") == 1) & (F.col("species_type_key") != HUMAN)
        )
        .select("species_type_key")
        .orderBy("species_type_key")
        .collect()
    )
    return [r.species_type_key for r in rows]


def run_all_species(
    store: StateStore,
    relations_for: Callable[[int], DataFrame],
    run_ts: datetime,
    delete_threshold_pct: float = 10.0,
) -> dict[int, SpeciesLoadResult]:
    """Run the species load for every searchable species. ``relations_for(key)``
    supplies the parsed relation stream per species (HCOP∪NCBI, S2/S3/U1)."""
    results: dict[int, SpeciesLoadResult] = {}
    for key in searchable_species_keys(store.read("species")):
        results[key] = run_species_load(
            store,
            relations_for(key),
            run_ts,
            key,
            delete_threshold_pct=delete_threshold_pct,
        )
    return results
