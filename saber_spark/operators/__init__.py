"""Spark operator stages of the KG-construction pipeline.

Each module is one pipeline stage, expressed DataFrame-first. UDF stages
(extract, tagger) are Arrow-backed pandas UDFs / mapInPandas only — never
row-at-a-time Python UDFs.
"""
