"""Structured Streaming support: deterministic file-replay of the events
fixture through real streaming graphs (micro-batch, availableNow)."""
