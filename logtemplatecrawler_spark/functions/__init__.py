"""Native column-expression library (JVM-side, codegen-friendly)."""
