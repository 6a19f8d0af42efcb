"""sqs_entity_resolution_ray — a Ray-Data-native record-linkage engine.

A from-scratch re-expression of the capabilities of
``codeforamerica/sqs-entity-resolution`` (queue-worker plumbing around the
Senzing ER engine; see ``/root/reference``) as a single streaming Ray Data
DAG: text extraction, MinHash-LSH blocking, pairwise scoring on actor
pools, transitive clustering via iterative label propagation, and
full/delta entity export with checkpoint/resume semantics.

Nothing here imports Ray at module scope except submodules that define
Dataset transforms; importing the package never calls ``ray.init()``.
"""

__version__ = "0.1.0"
