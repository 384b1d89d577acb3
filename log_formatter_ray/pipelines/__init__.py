"""End-to-end pipelines: the flagship sequences job and the config builder."""
