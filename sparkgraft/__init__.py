"""sparkgraft — a PySpark-native analytics engine.

Re-expresses the classic Hadoop batch-utility canon (filter/grep, count,
sort, join, distinct, top-k, sampling, sessionization, format conversion,
compaction) as Catalyst-optimized DataFrame programs, plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal columns,
text analysis). Blueprint: SURVEY.md; driver contract: __spark_entry__.py.

Importing this package imports every operator module, which registers all
queries/oracles into ``sparkgraft.registry``.
"""

from __future__ import annotations

from . import aggregates  # noqa: F401  (registers §2.4)
from . import avroio  # noqa: F401  (registers scan_avro_roundtrip)
from . import filters  # noqa: F401  (registers §2.2)
from . import functions  # noqa: F401  (registers §2.8)
from . import graph  # noqa: F401  (registers iterative graph analytics)
from . import joins  # noqa: F401  (registers §2.3)
from . import multimodal  # noqa: F401  (registers §2.11 mm_*)
from . import scans  # noqa: F401  (registers §2.1)
from . import skew  # noqa: F401  (registers §4 salted aggregation)
from . import sorts  # noqa: F401  (registers §2.6–2.7)
from . import sources  # noqa: F401  (registers custom source + observed metrics)
from . import sqlentry  # noqa: F401  (registers SQL entry path)
from . import streaming  # noqa: F401  (registers §2.9)
from . import textops  # noqa: F401  (registers §2.11 text/dedup)
from . import udfs  # noqa: F401  (registers §2.10)
from . import vectorops  # noqa: F401  (registers §2.11 sim_*/mm_*)
from . import windows  # noqa: F401  (registers §2.5)
from .catalog import TABLES, load, register_tables  # noqa: F401
from .registry import ORACLE, QUERIES  # noqa: F401
from .session import get_session  # noqa: F401

__version__ = "0.1.0"
