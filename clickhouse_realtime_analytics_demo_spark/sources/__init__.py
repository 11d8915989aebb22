"""Reference-shaped storage layer: schemas, seeded distributed data
generator, partitioned+sorted lake writer, and streaming ingest."""
