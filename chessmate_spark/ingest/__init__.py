from .pgn_ingest import IngestResult, ingest_pgn_text

__all__ = ["IngestResult", "ingest_pgn_text"]
