# Build the native runtime library (C++): CoLa parser, device clients,
# scan feeder. Output: native/build/libtpu_slam_native.so

.PHONY: native test smoke clean

native:
	cmake -S native -B native/build -DCMAKE_BUILD_TYPE=Release >/dev/null
	cmake --build native/build -j

test: native
	python -m pytest tests/ -q

# Fast CI tier: everything except the @pytest.mark.slow integration tests
# (< 5 min on a 2-core box); run `make test` for the full suite.
smoke: native
	python -m pytest tests/ -q -m "not slow" --durations=10

clean:
	rm -rf native/build
