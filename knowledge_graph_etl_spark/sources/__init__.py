from .jsonsrc import read_json_docs, write_json_docs
from .ntriples import read_ntriples, to_ntriples_lines, write_ntriples

__all__ = [
    "read_json_docs",
    "read_ntriples",
    "to_ntriples_lines",
    "write_json_docs",
    "write_ntriples",
]
