"""Plan inspection & scale guardrails."""

from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import (
    explain_str,
    plan_report,
)

__all__ = ["explain_str", "plan_report"]
