"""Scalar / vector / text functions (JVM-side expressions, codegen-friendly)."""
