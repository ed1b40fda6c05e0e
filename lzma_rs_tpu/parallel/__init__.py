"""Parallel runtime (SURVEY.md section 2.3): segment planner, device/host engines, mesh, multi-host DP."""
