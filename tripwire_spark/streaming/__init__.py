"""Streaming operators (SURVEY.md §2.9): sliding health monitor,
heartbeat liveness, visibility-delay retry queue."""
