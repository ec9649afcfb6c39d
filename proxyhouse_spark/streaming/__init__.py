"""Structured Streaming runtime: flush pipeline + DLQ replay."""
