"""Job orchestration + plan introspection."""
