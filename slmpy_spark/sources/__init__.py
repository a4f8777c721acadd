"""Sources & sinks: pages ingest, link extraction, edge derivation."""
