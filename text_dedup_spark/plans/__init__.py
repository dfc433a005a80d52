"""End-to-end pipelines composing the operators."""
