from .jobs import quad_stream, run_pipeline_stream, windowed_event_counts

__all__ = ["quad_stream", "run_pipeline_stream", "windowed_event_counts"]
