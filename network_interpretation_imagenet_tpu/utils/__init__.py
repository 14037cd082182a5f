"""Runtime utilities: checkpointing, conversion, logging, meters, profiling."""
