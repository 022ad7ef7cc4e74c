from .pipeline import translation_pipeline, translation_pipeline_summary  # noqa: F401
