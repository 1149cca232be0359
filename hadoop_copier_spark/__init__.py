"""hadoop_copier_spark — a PySpark-native analytics engine.

A brand-new engine covering the query/data-processing capabilities of the
reference (`neva-layna/hadoop-copier`, a Kerberos HDFS->local async copy
service) re-expressed Spark-first, plus the full relational operator
surface, Structured Streaming, UDF surface, and LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
declared in SURVEY.md §2b.

Design principles (100 TB discipline):
- DataFrame/SQL first; Catalyst + AQE pick physical strategy.
- No ``collect()`` on data paths; driver holds only metadata/listings.
- Decimal-cast aggregation for oracle determinism (SURVEY §2b rule 2).
- Broadcast small dimensions; shuffle only on declared keys.
"""

__version__ = "0.1.0"

from .copyjob import CopyItem, CopyJobEngine, CopyRequest, jvm_ugi_login  # noqa: F401
from .fs import fs_for, qualify  # noqa: F401
from .session import get_spark  # noqa: F401
from .tables import TABLES, load_table, register_views  # noqa: F401
