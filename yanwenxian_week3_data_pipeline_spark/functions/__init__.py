"""Scalar Column-expression builders. Everything here returns native Spark
``Column`` expressions (JVM-side, whole-stage-codegen friendly); the only
Python-at-runtime escape hatches are the clearly marked ``*_udf`` variants.
"""
