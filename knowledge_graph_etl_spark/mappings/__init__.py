"""The reference's mapping workload: fixtures + pipeline runner."""

from .fixtures import fixture_documents
from .pipeline import MAPPING_FILES, run_pipeline

__all__ = ["fixture_documents", "run_pipeline", "MAPPING_FILES"]
