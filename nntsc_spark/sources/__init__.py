"""Sources: testdata/table loaders and fact-table access patterns."""
