"""Sources & sinks: span-table IO and the checkpoint-manifest layer."""
