"""sakura_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference "sakura" semantic-relational-algebra engine (see SURVEY.md), built
Spark-first: every operator is expressed through the DataFrame / Spark SQL
API so Catalyst + Tungsten choose the physical strategy, and the design
assumes a multi-executor cluster at 100 TB even though tests run on local[*].

Layout:
  session     SparkSession factory tuned for the workload
  hashing     content-address (tuple/relation/database) hashing, Spark-side
  algebra     the reference's relational algebra as DataFrame combinators
  domains     domain (type) registry: integer/natural/rational/string + Spark types
  prelude     intensional (infinite) relations compiled to Column expressions
  drl/        S-expression query AST -> DataFrame compiler + finiteness gate
  icl/        first-order-logic constraint engine -> violation DataFrames
  database    versioned Database: DDL/DML, catalog, snapshot store
  management/ branches, diff, 3-way merge (DCL)
  scl         cursors (SCL)
  functions/  text analysis, dedup (exact/minhash/simhash), similarity search
  streaming/  Structured Streaming operators over the events stream
"""

from sakura_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
