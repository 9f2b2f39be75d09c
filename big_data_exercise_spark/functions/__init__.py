"""Column-level function library: text analysis, sentiment scoring,
array/embedding math. JVM-side built-ins wherever possible; Arrow
pandas UDFs only where Python is genuinely required.
"""
