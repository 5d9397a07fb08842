from .pgn_ingest import IngestResult, ingest_pgn_text
from .precheck import twic_precheck, twic_precheck_chunks

__all__ = [
    "IngestResult",
    "ingest_pgn_text",
    "twic_precheck",
    "twic_precheck_chunks",
]
