"""Cross-cutting utilities: CLI helpers, timers, logging."""
