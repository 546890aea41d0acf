"""fupi_ray — a Ray-Data-native lakehouse table-maintenance engine.

A from-scratch re-expression of the capabilities of ddmitov/fupi
(reference: /root/reference) on Ray Data:

* **Table lifecycle layer** — the observable contract of the reference's
  five LanceDB call sites (create-overwrite ``fupi/utils.py:39-49``,
  append ``fupi/embedders.py:124-125``, compaction
  ``fupi/embedders.py:127-128``, snapshot-pinned scan
  ``searcher.py:404-405``/``207-208``, top-k search
  ``fupi/utils.py:149-161``) implemented explicitly: JSON manifests +
  immutable Parquet fragments + zone maps + snapshot pins + compaction +
  Z-order/Hilbert clustering + MERGE INTO.
* **Dataflow layer** — every operator of the reference ingest/query
  pipelines (SURVEY.md §2) as ``ray.data.Dataset`` transforms:
  ``map_batches`` over zero-copy Arrow, actor pools for stateful stages,
  ``groupby``/``sort`` only where an exchange is semantically required.

Nothing here calls ``ray.init`` — sessions are owned by the caller
(bench.py, tests/conftest.py, or the driving harness).
"""

from fupi_ray.config import EngineConfig
from fupi_ray.table import Table

__all__ = ["EngineConfig", "Table"]
__version__ = "0.1.0"
