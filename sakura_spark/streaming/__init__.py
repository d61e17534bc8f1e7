"""Structured Streaming operators over event streams.

The reference has no streaming surface (SURVEY §2.1); this package extends
the engine with the standard streaming shapes a production deployment of
the events table needs: watermarked tumbling/sliding windows, session
windows, and custom stateful processing via applyInPandasWithState.
"""
