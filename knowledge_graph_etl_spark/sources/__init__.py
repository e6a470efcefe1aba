from .jsonsrc import read_json_docs, write_json_docs
from .ntriples import read_ntriples, to_ntriples_lines, write_ntriples
from .turtle import parse_turtle, read_rdf, read_turtle

__all__ = [
    "parse_turtle",
    "read_json_docs",
    "read_ntriples",
    "read_rdf",
    "read_turtle",
    "to_ntriples_lines",
    "write_json_docs",
    "write_ntriples",
]
