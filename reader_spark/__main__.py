"""`python -m reader_spark --config job.yaml` — the reference
binary's run loop (see reader_spark/job.py)."""

from reader_spark.job import main

if __name__ == "__main__":
    main()
