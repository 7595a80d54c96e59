"""Program surface: the reference's program/function graph
(SURVEY §3.1) as a Spark-first DSL.

A *program* is a named set of *functions* (each producing a stream
with a fixed schema) wired by FROM references; the reference compiles
each function to a worker process and the supervisor runs the DAG
(src/RamenProgram.ml, src/RamenSupervisor.ml). Here a function is a
DataFrame-producing callable; materialization registers temp views in
topological order — Catalyst then fuses the whole graph into one plan
per sink, which is strictly better than process-per-function (no
serialization boundaries between functions at all).
"""

from ramen_spark.plans.program import Function, Program

__all__ = ["Function", "Program"]
