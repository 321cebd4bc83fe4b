"""Query planning: route a pixel query to its cheapest physical path."""

from pennsieve_streaming_spark.plans.router import (  # noqa: F401
    QueryPlan,
    plan_pixel_query,
)
