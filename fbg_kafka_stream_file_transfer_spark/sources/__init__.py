"""Sources: testdata tables, binary files, Kafka wire format."""
