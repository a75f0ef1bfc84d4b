from python_mozetl_spark.cli import entry_point

entry_point()
