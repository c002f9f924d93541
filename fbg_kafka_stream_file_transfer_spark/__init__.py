"""fbg_kafka_stream_file_transfer_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference streaming file-transfer pipeline (`0xlukas/fbg-kafka-stream-file-transfer`,
a GoAnywhere → AMQ → Camel/Quarkus → S3 + Docling document pipeline), re-expressed
Spark-first:

- the *transfer envelope* data model (reference README.md:163-169) as an
  explicit ``StructType`` (:mod:`.envelope`),
- the route's projections / derivations / validation / routing
  (reference camel/file-pipeline.yaml) as Catalyst-native column
  expressions (:mod:`.functions`, :mod:`.operators.validate`,
  :mod:`.operators.routing`),
- the monitoring-plane aggregations (reference k8s/monitoring/alerts.yaml)
  as windowed DataFrame aggregations (:mod:`.operators.monitoring`),
- retry-with-backoff / DLQ / expiry semantics
  (reference camel/file-pipeline.yaml:265-277, k8s/amq-broker.yaml:76-82)
  as a deterministic state machine over attempt columns
  (:mod:`.operators.retry`),
- the Docling-style per-row document extraction (reference
  camel/file-pipeline.yaml:124-167) as an Arrow-batched ``mapInPandas``
  operator with a circuit breaker (:mod:`.operators.extract`),
- Structured Streaming assembly of the full pipeline
  (:mod:`.streaming.pipeline`),
- plus the LLM-data-pipeline extension operators: deduplication
  (:mod:`.operators.dedup`), similarity search
  (:mod:`.operators.similarity`), text analysis (:mod:`.functions.text`),
  and multimodal column handling (:mod:`.operators.multimodal`).

Everything is DataFrame/SQL-first so Catalyst gets to optimize; Python
is confined to Arrow-batched UDFs on the genuinely non-relational paths.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
