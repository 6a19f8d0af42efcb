"""Sources: corpus generation, page readers, record-model loaders."""
