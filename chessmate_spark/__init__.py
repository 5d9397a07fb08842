"""chessmate_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of HendrikReh/chessmate (reference: OCaml +
Postgres + Qdrant), re-expressed Spark-first.

Layout:
  chess/      pure-Python chess domain: PGN parse, SAN→FEN replay, FEN validate
  query/      natural-language → query plan compiler (driver-side)
  functions/  Spark Column expression builders (text, scoring, vectors, hashing)
  operators/  DataFrame operators: relational search, top-k, similarity, dedup
  ingest/     PGN → games/players/positions/embedding_jobs batch pipeline
  plans/      hybrid executor (filters + vector + keyword scoring + paging)
  streaming/  embedding-jobs micro-batch queue pipeline
"""

__version__ = "0.1.0"
