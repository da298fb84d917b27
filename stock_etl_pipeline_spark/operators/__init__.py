"""Operator surface of the engine (SURVEY.md §2 inventory).

Each module holds lazy DataFrame → DataFrame compositions; nothing here
triggers an action. Physical strategy (broadcast vs sort-merge, partial aggs,
whole-stage codegen) is Catalyst's job — these functions only declare plans.
"""
