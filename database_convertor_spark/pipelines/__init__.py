from .weekly import WeeklyPipelineResult, run_weekly_pipeline  # noqa: F401
