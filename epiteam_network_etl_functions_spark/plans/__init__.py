"""Composed multi-stage pipelines (the reference's handler chains as plain
function composition over DataFrames)."""
