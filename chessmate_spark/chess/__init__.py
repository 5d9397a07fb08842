from .fen import FenError, normalize_fen, fen_md5
from .replay import ReplayError, fens_of_moves, fen_after_move
from .pgn import PgnError, parse_game, split_games, parse_games, iter_games
from .metadata import GameMetadata, Player, metadata_of_headers, normalize_date
from . import openings

__all__ = [
    "FenError",
    "normalize_fen",
    "fen_md5",
    "ReplayError",
    "fens_of_moves",
    "fen_after_move",
    "PgnError",
    "parse_game",
    "split_games",
    "parse_games",
    "iter_games",
    "GameMetadata",
    "Player",
    "metadata_of_headers",
    "normalize_date",
    "openings",
]
