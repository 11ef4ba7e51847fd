"""rdflib_r2r_ray — a Ray-Data-native knowledge-graph construction and
data-processing engine with the query/mapping capabilities of the reference
``DaaX-AI/rdflib-r2r`` (R2RML virtual-KG engine), re-architected for
streaming Arrow-batch execution on Ray clusters.

Layout:
- ``terms`` / ``template`` / ``mapping``: the declarative mapping-rule model
  (TriplesMap / term maps, IRI templates, N3 term encoding)
- ``stages``: map_batches stages (extract, emit, linker, canonicalize,
  dedup, textstats, similarity, multimodal)
- ``pipelines``: end-to-end pipelines (KG construction)
- ``ops``: relational operator layer (SPARQL-algebra parity: filter, join,
  union, minus, exists, aggregate, sort, ...)
- ``sources`` / ``state``: readers and lineage/checkpoint manifests
- ``oracle``: pure-Python per-row reference-semantics re-execution for tests
"""

__version__ = "0.1.0"
