// View model + UI: server URL field, start/stop, live transcript with
// speaker labels, the unstable buffer in dim text, lag indicator.

import SwiftUI

@MainActor
final class SessionModel: ObservableObject {
    @Published var serverURL = "ws://localhost:8000/asr"
    @Published var connected = false
    @Published var recording = false
    @Published var lines: [TranscriptLine] = []
    @Published var buffer = ""
    @Published var lagSeconds = 0.0
    @Published var errorText: String?

    private let transport = SocketTransport()
    private let capture = MicCapture()

    init() {
        transport.onMessage = { [weak self] front in
            Task { @MainActor in self?.apply(front) }
        }
        transport.onStateChange = { [weak self] up in
            Task { @MainActor in self?.connected = up }
        }
    }

    func start() {
        guard let url = URL(string: serverURL) else {
            errorText = "invalid server URL"
            return
        }
        errorText = nil
        lines = []
        buffer = ""
        transport.connect(url)
        capture.onPCM = { [transport] data in transport.sendPCM(data) }
        do {
            try capture.start()
            recording = true
        } catch {
            errorText = "microphone unavailable: \(error.localizedDescription)"
        }
    }

    func stop() {
        capture.stop()
        transport.finish()
        recording = false
    }

    private func apply(_ front: FrontData) {
        if let err = front.error { errorText = err }
        if let newLines = front.lines { lines = newLines }
        buffer = front.buffer_transcription ?? ""
        lagSeconds = front.remaining_time_transcription ?? 0
    }
}

struct SessionView: View {
    @ObservedObject var model: SessionModel

    var body: some View {
        VStack(spacing: 12) {
            HStack {
                TextField("ws://host:port/asr", text: $model.serverURL)
                    .textFieldStyle(.roundedBorder)
                    .disabled(model.recording)
                Button(model.recording ? "Stop" : "Start") {
                    model.recording ? model.stop() : model.start()
                }
                .keyboardShortcut(.space, modifiers: [])
                Circle()
                    .fill(model.connected ? Color.green : Color.red)
                    .frame(width: 10, height: 10)
                    .help(model.connected ? "connected" : "disconnected")
            }

            if let err = model.errorText {
                Text(err).foregroundColor(.red).font(.callout)
            }

            ScrollViewReader { proxy in
                ScrollView {
                    LazyVStack(alignment: .leading, spacing: 6) {
                        ForEach(model.lines) { line in
                            HStack(alignment: .top, spacing: 8) {
                                Text(line.speaker >= 0 ? "S\(line.speaker)" : "·")
                                    .font(.caption.monospaced())
                                    .foregroundColor(.secondary)
                                Text((line.text?.isEmpty == false) ? line.text! : "‹silence›")
                                    .textSelection(.enabled)
                            }
                            .id(line.id)
                        }
                        if !model.buffer.isEmpty {
                            Text(model.buffer)
                                .foregroundColor(.secondary)
                                .italic()
                                .id("buffer")
                        }
                    }
                    .frame(maxWidth: .infinity, alignment: .leading)
                    .padding(.horizontal, 4)
                }
                .onChange(of: model.buffer) { _ in
                    proxy.scrollTo("buffer", anchor: .bottom)
                }
            }
            .background(Color(nsColor: .textBackgroundColor))
            .cornerRadius(8)

            HStack {
                Text(String(format: "lag %.1fs", model.lagSeconds))
                    .font(.caption.monospaced())
                    .foregroundColor(model.lagSeconds > 3 ? .orange : .secondary)
                Spacer()
            }
        }
        .padding(16)
    }
}
