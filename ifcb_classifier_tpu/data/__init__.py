"""Data layer: IFCB bin ingestion, training datasets, host→device input pipeline."""
