import sys

from platform_etl_backend_spark.engine.runner import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
