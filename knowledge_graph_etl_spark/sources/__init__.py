from .jsonsrc import read_json_docs, write_json_docs
from .ntriples import (
    read_nquads,
    read_ntriples,
    to_nquads_lines,
    to_ntriples_lines,
    write_nquads,
    write_ntriples,
)
from .turtle import parse_turtle, read_rdf, read_turtle

__all__ = [
    "parse_turtle",
    "read_json_docs",
    "read_nquads",
    "read_ntriples",
    "read_rdf",
    "read_turtle",
    "to_nquads_lines",
    "to_ntriples_lines",
    "write_json_docs",
    "write_nquads",
    "write_ntriples",
]
