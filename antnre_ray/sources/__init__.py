"""Sources & sinks: storage facade and corpus derivation."""
