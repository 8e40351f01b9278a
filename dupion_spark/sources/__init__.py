"""Sources & sinks: synthetic fixture generation, table loaders, checkpoints."""
