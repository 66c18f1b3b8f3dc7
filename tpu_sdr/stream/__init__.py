"""Streaming runtime: host feeders, rtl_tcp client/server, device ingest."""
