from .bucketed import read_table, shuffle_exchange_count, write_bucketed
from .fen_emit import emit_fens, write_fens
from .pgn_ingest import IngestResult, ingest_pgn_text
from .precheck import twic_precheck, twic_precheck_chunks

__all__ = [
    "read_table",
    "shuffle_exchange_count",
    "write_bucketed",
    "emit_fens",
    "write_fens",
    "IngestResult",
    "ingest_pgn_text",
    "twic_precheck",
    "twic_precheck_chunks",
]
