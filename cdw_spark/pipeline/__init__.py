"""The Sparkify star-schema ELT recreated Spark-first."""
