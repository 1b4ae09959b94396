"""Result serialization: validation-results and run-results writers
(.json/.mat/.h5) with byte-layout parity to the reference."""
